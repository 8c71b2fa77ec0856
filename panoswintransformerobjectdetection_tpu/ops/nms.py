"""Fixed-shape NMS family: nms / batched_nms / multiclass_nms.

TPU-native replacement for the mmcv CUDA kernels referenced at
`mmdet/models/dense_heads/panorpn_head.py:241` and
`mmdet/core/post_processing/bbox_nms.py:7`.  Exact greedy semantics
(highest score first, suppress IoU > threshold) expressed as a rolled
`fori_loop` over the sorted candidate list with vectorized suppression
updates — O(N^2) data-parallel work, O(N) sequential steps, static shapes
throughout.  Candidate counts are padded: invalid entries carry -inf score.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.bbox import bbox_overlaps

NEG_INF = -1e10


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (K, 4)
    scores: jnp.ndarray   # (K,) — NEG_INF on padded slots
    idx: jnp.ndarray      # (K,) indices into the input
    mask: jnp.ndarray     # (K,) bool


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, valid: jnp.ndarray = None) -> NMSResult:
    """Greedy NMS.  boxes (N, 4), scores (N,); returns top `max_out` kept
    boxes in descending score order, padded with mask=False."""
    N = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    rank = jnp.arange(N)

    # IoU rows are computed inside the loop — O(N) memory, not an N^2
    # matrix (a (B, N, N, 2) broadcast at RPN candidate counts would blow
    # HBM under vmap)
    def body(i, sup):
        alive = jnp.logical_not(sup[i]) & (s[i] > NEG_INF / 2)
        bi = jax.lax.dynamic_slice(b, (i, 0), (1, 4))[0]
        lt = jnp.maximum(bi[:2], b[:, :2])
        rb = jnp.minimum(bi[2:], b[:, 2:])
        wh = jnp.clip(rb - lt, 0.0, None)
        inter = wh[:, 0] * wh[:, 1]
        ai = jnp.maximum(bi[2] - bi[0], 0) * jnp.maximum(bi[3] - bi[1], 0)
        iou_row = inter / jnp.maximum(ai + area - inter, 1e-6)
        return sup | (alive & (iou_row > iou_threshold) & (rank > i))

    sup = jax.lax.fori_loop(0, N, body, jnp.zeros(N, bool))
    keep = jnp.logical_not(sup) & (s > NEG_INF / 2)

    rank_score = jnp.where(keep, s, NEG_INF)
    _, top = jax.lax.top_k(rank_score, max_out)
    mask = keep[top]
    return NMSResult(b[top], jnp.where(mask, s[top], NEG_INF), order[top], mask)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, idxs: jnp.ndarray,
                iou_threshold: float, max_out: int,
                valid: jnp.ndarray = None) -> NMSResult:
    """Category/level-aware NMS via the coordinate-offset trick (boxes of
    different `idxs` never overlap).  Returned boxes are the originals."""
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True,
                                  boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    r = nms(shifted, scores, iou_threshold, max_out, valid)
    orig = boxes[r.idx]
    return NMSResult(orig, r.scores, r.idx, r.mask)


class DetResult(NamedTuple):
    boxes: jnp.ndarray    # (K, 4)
    scores: jnp.ndarray   # (K,)
    labels: jnp.ndarray   # (K,) int32
    mask: jnp.ndarray     # (K,) bool


def multiclass_nms(multi_boxes: jnp.ndarray, multi_scores: jnp.ndarray,
                   score_thr: float, iou_threshold: float,
                   max_per_img: int, pre_nms: int = 2000,
                   valid: jnp.ndarray = None) -> DetResult:
    """Class-wise NMS over decoded boxes (`bbox_nms.py:7 multiclass_nms`).

    multi_boxes: (N, 4) or (N, C*4); multi_scores: (N, C+1) with background
    last (dropped).  Candidates below `score_thr` are masked; the top
    `pre_nms` candidates across all classes enter batched NMS.
    """
    N, Cp1 = multi_scores.shape
    C = Cp1 - 1
    scores = multi_scores[:, :C]                          # (N, C)
    if multi_boxes.shape[-1] == 4:
        boxes = jnp.broadcast_to(multi_boxes[:, None, :], (N, C, 4))
    else:
        boxes = multi_boxes.reshape(N, C, 4)

    flat_scores = scores.reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    flat_labels = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (N, C)).reshape(-1)
    ok = flat_scores > score_thr
    if valid is not None:
        ok = ok & jnp.repeat(valid, C)
    cand_scores = jnp.where(ok, flat_scores, NEG_INF)

    k = min(pre_nms, cand_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(cand_scores, k)
    top_boxes = flat_boxes[top_idx]
    top_labels = flat_labels[top_idx]
    top_valid = top_scores > NEG_INF / 2

    r = batched_nms(top_boxes, top_scores, top_labels, iou_threshold,
                    max_per_img, top_valid)
    labels = top_labels[r.idx]
    return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                     jnp.where(r.mask, labels, -1), r.mask)
