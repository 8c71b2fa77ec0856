"""Fixed-shape MaxIoU assignment (no dynamic boolean indexing).

Semantics of mmdet `MaxIoUAssigner.assign_wrt_overlaps`
(`mmdet/core/bbox/assigners/max_iou_assigner.py:10`):
  -1 = ignore, 0 = negative, g+1 = assigned to gt g.
  negative if 0 <= max_overlap < neg_iou_thr;
  positive if max_overlap >= pos_iou_thr (to the argmax gt);
  low-quality matching: every anchor tying a gt's best overlap is assigned
  to that gt when that best overlap >= min_pos_iou (later gts override —
  reproduced here by taking the max gt index among candidates).
"""

from typing import Tuple

import jax

from .bbox import bbox_overlaps

import jax.numpy as jnp


def max_iou_assign(ious: jnp.ndarray, gt_valid: jnp.ndarray,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = True,
                   eps: float = 1e-7) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image.  ious: (G, N) anchor overlaps (rows for padded gts are
    arbitrary); gt_valid: (G,) bool.  Returns (assigned (N,) int32,
    max_overlaps (N,)).
    """
    G, N = ious.shape
    ious = jnp.where(gt_valid[:, None], ious, -1.0)

    max_overlaps = ious.max(axis=0)
    argmax_gt = ious.argmax(axis=0)

    assigned = jnp.full((N,), -1, jnp.int32)
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr),
                         0, assigned)
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_gt.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_max = ious.max(axis=1, keepdims=True)                  # (G, 1)
        is_cand = (jnp.abs(ious - gt_max) < eps) & (gt_max >= min_pos_iou) \
            & gt_valid[:, None]
        gt_ids = jnp.arange(1, G + 1, dtype=jnp.int32)[:, None]
        lowq = jnp.max(jnp.where(is_cand, gt_ids, 0), axis=0)     # (N,)
        assigned = jnp.where(lowq > 0, lowq, assigned)

    return assigned, max_overlaps


def atss_assign(anchors: jnp.ndarray, level_slices, gts: jnp.ndarray,
                gvalid: jnp.ndarray, topk: int = 9):
    """ATSS assignment (`mmdet/core/bbox/assigners/atss_assigner.py`).

    anchors: (N, 4) all levels; level_slices: static list of (start, size);
    gts: (G, 4).  Per gt: top-`topk` center-closest anchors per level are
    candidates; IoU threshold = mean + std of candidate IoUs; positive if
    IoU >= thr and anchor center inside the gt.  Anchors claimed by several
    gts go to the highest-IoU one.  Returns assigned (N,) (-1/0/g+1).
    """
    N = anchors.shape[0]
    G = gts.shape[0]
    ac = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                    (anchors[:, 1] + anchors[:, 3]) / 2], -1)   # (N, 2)
    gc = jnp.stack([(gts[:, 0] + gts[:, 2]) / 2,
                    (gts[:, 1] + gts[:, 3]) / 2], -1)           # (G, 2)
    dist = jnp.linalg.norm(ac[None, :, :] - gc[:, None, :], axis=-1)  # (G, N)
    ious = bbox_overlaps(gts, anchors)                          # (G, N)

    cand = jnp.zeros((G, N), bool)
    for (start, size) in level_slices:
        k = min(topk, size)
        _, idx = jax.lax.top_k(-dist[:, start:start + size], k)
        rows = jnp.arange(G)[:, None].repeat(k, 1)
        cand = cand.at[rows.reshape(-1),
                       (idx + start).reshape(-1)].set(True)

    cious = jnp.where(cand, ious, jnp.nan)
    mean = jnp.nanmean(cious, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.nanmean((cious - mean) ** 2, axis=1, keepdims=True))
    thr = mean + std

    inside = ((ac[None, :, 0] > gts[:, None, 0]) &
              (ac[None, :, 0] < gts[:, None, 2]) &
              (ac[None, :, 1] > gts[:, None, 1]) &
              (ac[None, :, 1] < gts[:, None, 3]))
    pos = cand & (ious >= thr) & inside & gvalid[:, None]

    masked = jnp.where(pos, ious, -1.0)
    best_gt = masked.argmax(0)
    has = masked.max(0) > 0
    return jnp.where(has, best_gt.astype(jnp.int32) + 1, 0)


def point_assign(points: jnp.ndarray, strides: jnp.ndarray, gts: jnp.ndarray,
                 gvalid: jnp.ndarray, scale: float = 4.0, pos_num: int = 3):
    """Point assignment (`mmdet/core/bbox/assigners/point_assigner.py`,
    RepPoints): each gt picks its level by log2(sqrt(wh)/scale), then claims
    the `pos_num` nearest points (distance normalized by gt size) at that
    level; a point contested by several gts goes to the nearest one.
    Returns assigned (N,) with 0 = background, g+1 = gt index.
    """
    gw = gts[:, 2] - gts[:, 0]
    gh = gts[:, 3] - gts[:, 1]
    gc = jnp.stack([(gts[:, 0] + gts[:, 2]) / 2,
                    (gts[:, 1] + gts[:, 3]) / 2], -1)             # (G, 2)
    glvl = jnp.clip(jnp.floor(
        jnp.log2(jnp.sqrt(jnp.clip(gw * gh, 1e-6)) / scale + 1e-6)), 0, None)
    plvl = jnp.log2(strides)                                      # (N,)
    same = jnp.abs(plvl[None, :] - glvl[:, None]) < 0.5           # (G, N)
    gsize = jnp.sqrt(jnp.clip(gw * gh, 1e-6))[:, None]
    dist = jnp.linalg.norm(points[None, :, :2] - gc[:, None, :],
                           axis=-1) / gsize                       # (G, N)
    BIG = 1e8
    dist = jnp.where(same & gvalid[:, None], dist, BIG)
    G, N = dist.shape
    k = min(pos_num, N)
    nd, _ = jax.lax.top_k(-dist, k)
    kth = -nd[:, -1]                                              # (G,)
    claimed = dist <= kth[:, None]
    masked = jnp.where(claimed, dist, BIG)
    best_gt = masked.argmin(0)
    has = masked.min(0) < BIG
    return jnp.where(has, best_gt.astype(jnp.int32) + 1, 0)
