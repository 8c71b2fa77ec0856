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
    """(..., 4) xyxy -> (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(a: jnp.ndarray, b: jnp.ndarray, mode: str = "iou",
                  eps: float = 1e-6) -> jnp.ndarray:
    """All-pairs IoU / IoF: (..., N, 4), (..., M, 4) -> (..., N, M)."""
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
    """xyxy -> (x, y, w, h) (`lzx/coor_transition.py:4 xyxy2tlwh`)."""
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
