"""Box primitives: IoU/IoF, DeltaXYWH encode/decode, clip/flip.

Numerics follow mmdet v2.11 (`mmdet/core/bbox/iou_calculators/iou2d_calculator.py`,
`mmdet/core/bbox/coder/delta_xywh_bbox_coder.py`): widths are x2-x1 (no +1),
decode clamps log-space dw/dh at |log(16/1000)| by default, boxes clip to
[0, W]/[0, H].
"""

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (...).

    Example:
        >>> import jax.numpy as jnp
        >>> float(bbox_area(jnp.array([0., 0., 4., 2.])))
        8.0
    """
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(a: jnp.ndarray, b: jnp.ndarray, mode: str = "iou",
                  eps: float = 1e-6) -> jnp.ndarray:
    """All-pairs IoU / IoF: (..., N, 4), (..., M, 4) -> (..., N, M).

    Example:
        >>> import jax.numpy as jnp
        >>> a = jnp.array([[0., 0., 2., 2.]])
        >>> b = jnp.array([[1., 1., 3., 3.], [4., 4., 5., 5.]])
        >>> [round(float(v), 4) for v in bbox_overlaps(a, b)[0]]
        [0.1429, 0.0]
    """
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area_a = bbox_area(a)[..., :, None]
    if mode == "iof":
        union = area_a
    else:
        union = area_a + bbox_area(b)[..., None, :] - overlap
    return overlap / jnp.maximum(union, eps)


def delta_encode(proposals: jnp.ndarray, gt: jnp.ndarray,
                 means: Sequence[float] = (0., 0., 0., 0.),
                 stds: Sequence[float] = (1., 1., 1., 1.)) -> jnp.ndarray:
    """xyxy boxes -> normalized (dx, dy, dw, dh) deltas (`bbox2delta:88`)."""
    # eps guards keep padded/degenerate boxes finite (their loss rows are
    # masked, but inf/nan would still poison gradients through 0*inf)
    eps = 1e-6
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], eps)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], eps)
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    return (d - means) / stds


def delta_decode(rois: jnp.ndarray, deltas: jnp.ndarray,
                 means: Sequence[float] = (0., 0., 0., 0.),
                 stds: Sequence[float] = (1., 1., 1., 1.),
                 max_shape: Optional[Tuple[int, int]] = None,
                 wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """Apply deltas to boxes (`delta2bbox:133`).

    rois: (..., 4); deltas: (..., 4k) (k classes share the roi); returns
    (..., 4k) xyxy, optionally clipped to (H, W) = max_shape.
    """
    k = deltas.shape[-1] // 4
    means = jnp.tile(jnp.asarray(means, deltas.dtype), k)
    stds = jnp.tile(jnp.asarray(stds, deltas.dtype), k)
    d = deltas * stds + means
    dx, dy = d[..., 0::4], d[..., 1::4]
    dw, dh = d[..., 2::4], d[..., 3::4]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    out = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(deltas.shape)
    if max_shape is not None:
        out = clip_boxes(out, max_shape)
    return out


def clip_boxes(boxes: jnp.ndarray, max_shape: Tuple[int, int]) -> jnp.ndarray:
    """Clip (..., 4k) xyxy boxes to [0, W] x [0, H]; max_shape = (H, W)."""
    h, w = max_shape[0], max_shape[1]
    flat = boxes.reshape(boxes.shape[:-1] + (-1, 4))
    x = jnp.clip(flat[..., 0::2], 0, w)
    y = jnp.clip(flat[..., 1::2], 0, h)
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out.reshape(boxes.shape)


def flip_boxes(boxes: jnp.ndarray, img_w: float, direction: str = "horizontal") -> jnp.ndarray:
    """Horizontal flip of xyxy boxes in an image of width `img_w`."""
    assert direction == "horizontal"
    x1 = img_w - boxes[..., 2]
    x2 = img_w - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def xyxy_to_tlwh(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (x, y, w, h) (`lzx/coor_transition.py:4 xyxy2tlwh`).

    Example:
        >>> import jax.numpy as jnp
        >>> xyxy_to_tlwh(jnp.array([1., 2., 5., 4.])).tolist()
        [1.0, 2.0, 4.0, 2.0]
    """
    return jnp.stack([boxes[..., 0], boxes[..., 1],
                      boxes[..., 2] - boxes[..., 0],
                      boxes[..., 3] - boxes[..., 1]], axis=-1)


def tlwh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y, w, h) -> xyxy (`coor_transition.py:11`)."""
    return jnp.stack([boxes[..., 0], boxes[..., 1],
                      boxes[..., 0] + boxes[..., 2],
                      boxes[..., 1] + boxes[..., 3]], axis=-1)


def normalize01_xyxy(boxes: jnp.ndarray, w, h) -> jnp.ndarray:
    """Pixel xyxy -> [0, 1] normalized (`coor_transition.py:18`)."""
    s = jnp.asarray([w, h, w, h], boxes.dtype)
    return boxes / s


def unnormalize01_xyxy(boxes: jnp.ndarray, w, h) -> jnp.ndarray:
    """[0, 1] normalized xyxy -> pixels (`coor_transition.py:24`)."""
    s = jnp.asarray([w, h, w, h], boxes.dtype)
    return boxes * s


# ---------------------------------------------------------------------------
# Reference-named transform API (`mmdet/core/bbox/transforms.py`), for users
# porting custom heads.  Pure-functional jnp rewrites: stride-4 multi-box
# layouts are reshaped to (..., k, 4) and re-flattened instead of the
# reference's in-place strided writes.
# ---------------------------------------------------------------------------

def bbox_flip(bboxes, img_shape, direction: str = "horizontal"):
    """`transforms.py:5`: flip (..., 4k) boxes inside (H, W) `img_shape`;
    direction horizontal | vertical | diagonal."""
    assert bboxes.shape[-1] % 4 == 0
    assert direction in ("horizontal", "vertical", "diagonal")
    h, w = img_shape[0], img_shape[1]
    b = bboxes.reshape(*bboxes.shape[:-1], -1, 4)
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    if direction in ("horizontal", "diagonal"):
        x1, x2 = w - x2, w - x1
    if direction in ("vertical", "diagonal"):
        y1, y2 = h - y2, h - y1
    return jnp.stack([x1, y1, x2, y2], -1).reshape(bboxes.shape)


def bbox_mapping(bboxes, img_shape, scale_factor, flip,
                 flip_direction: str = "horizontal"):
    """`transforms.py:34`: original-image boxes -> testing (aug) scale."""
    out = bboxes * jnp.asarray(scale_factor, bboxes.dtype)
    return bbox_flip(out, img_shape, flip_direction) if flip else out


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip,
                      flip_direction: str = "horizontal"):
    """`transforms.py:46`: testing-scale boxes -> original image scale."""
    out = bbox_flip(bboxes, img_shape, flip_direction) if flip else bboxes
    return out / jnp.asarray(scale_factor, bboxes.dtype)


def bbox2roi(bbox_list):
    """`transforms.py:58`: per-image (n_i, 4) boxes -> (sum n_i, 5) rois
    with a leading image index.  With equal n_i (the fixed-shape case) the
    result is block-ordered, matching `multilevel_roi_align`'s fast path."""
    rois = []
    for i, b in enumerate(bbox_list):
        idx = jnp.full((b.shape[0], 1), float(i), b.dtype)
        rois.append(jnp.concatenate([idx, b[:, :4]], axis=1))
    return jnp.concatenate(rois, axis=0) if rois else jnp.zeros((0, 5))


def roi2bbox(rois):
    """`transforms.py:80`: (R, 5) rois -> per-image list of (n_i, 4).
    Host-side (ragged output can't be jitted)."""
    import numpy as np
    rois = np.asarray(rois)
    return [rois[rois[:, 0] == i, 1:] for i in np.unique(rois[:, 0])]


def bbox2result(bboxes, labels, num_classes):
    """`transforms.py:99`: (n, 5) boxes+score and (n,) labels -> per-class
    list of numpy (k, 5).  Host-side result formatting."""
    import numpy as np
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), np.float32) for _ in range(num_classes)]
    return [bboxes[labels == i, :].astype(np.float32)
            for i in range(num_classes)]


def distance2bbox(points, distance, max_shape=None):
    """`transforms.py:119`: (l, t, r, b) distances from points -> xyxy,
    optionally clamped to (H, W) `max_shape`."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1, x2 = jnp.clip(x1, 0, w), jnp.clip(x2, 0, w)
        y1, y2 = jnp.clip(y1, 0, h), jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], -1)


def bbox2distance(points, bbox, max_dis=None, eps=0.1):
    """`transforms.py:159`: xyxy boxes -> (l, t, r, b) distances,
    optionally clipped into [0, max_dis - eps] (DFL integral range)."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], -1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


def bbox_rescale(bboxes, scale_factor: float = 1.0):
    """`transforms.py:183`: scale box w/h about the center; accepts (n, 4)
    boxes or (n, 5) rois (index column preserved)."""
    box = bboxes[:, 1:] if bboxes.shape[1] == 5 else bboxes
    cx = (box[:, 0] + box[:, 2]) * 0.5
    cy = (box[:, 1] + box[:, 3]) * 0.5
    w = (box[:, 2] - box[:, 0]) * scale_factor
    h = (box[:, 3] - box[:, 1]) * scale_factor
    out = jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                     cx + 0.5 * w, cy + 0.5 * h], -1)
    if bboxes.shape[1] == 5:
        out = jnp.concatenate([bboxes[:, :1], out], axis=1)
    return out


def bbox_cxcywh_to_xyxy(bbox):
    """`transforms.py:215`.

    Example:
        >>> import jax.numpy as jnp
        >>> bbox_cxcywh_to_xyxy(jnp.array([2., 2., 2., 4.])).tolist()
        [1.0, 0.0, 3.0, 4.0]
    """
    cx, cy, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], -1)


def bbox_xyxy_to_cxcywh(bbox):
    """`transforms.py:229`."""
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return jnp.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], -1)


def multi_apply(func, *args, **kwargs):
    """`mmdet/core/utils/misc.py:10`: map func over zipped list args,
    transpose the per-call tuples into per-output tuples."""
    import functools
    pfunc = functools.partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))
