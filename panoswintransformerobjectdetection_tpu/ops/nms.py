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


NMS_BLOCK = 256


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    ab = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(aa[:, None] + ab[None, :] - inter, 1e-6)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int, valid: jnp.ndarray = None) -> NMSResult:
    """Exact greedy NMS, block-parallel for TPU.

    Candidates are processed in score order in blocks of `NMS_BLOCK`:
    within a block, greedy survivorship is the fixpoint of iterated
    suppression over the upper-triangular IoU mask (converges in
    O(longest chain) iterations, bounded by a `while_loop`); surviving
    rows then suppress all later candidates in one vectorized pass.
    Sequential depth is O(N / BLOCK * chain) instead of O(N), with
    O(BLOCK * N) peak memory.  Matches the scalar greedy algorithm (the
    mmcv `nms` semantics) exactly.

    Example:
        >>> import jax.numpy as jnp
        >>> boxes = jnp.array([[0., 0., 10., 10.], [1., 1., 11., 11.],
        ...                    [20., 20., 30., 30.]])
        >>> r = nms(boxes, jnp.array([0.9, 0.8, 0.7]), 0.5, max_out=3)
        >>> r.idx[r.mask].tolist()   # second box suppressed by the first
        [0, 2]
    """
    N = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]

    T = min(NMS_BLOCK, N)
    nb = -(-N // T)
    pad = nb * T - N
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)], 0)
        s = jnp.concatenate([s, jnp.full((pad,), NEG_INF, s.dtype)], 0)
    Np = nb * T
    tri = jnp.arange(T)[:, None] < jnp.arange(T)[None, :]   # tri[j, i] = (j < i)

    def block_body(bi, sup):
        r0 = bi * T
        rows = jax.lax.dynamic_slice(b, (r0, 0), (T, 4))
        rows_sup = jax.lax.dynamic_slice(sup, (r0,), (T,))
        rows_valid = jax.lax.dynamic_slice(s, (r0,), (T,)) > NEG_INF / 2
        iou_rows = _pairwise_iou(rows, b)                    # (T, Np)
        blk = jax.lax.dynamic_slice(iou_rows, (0, r0), (T, T))
        over = (blk > iou_threshold) & tri                   # over[j, i]: j<i suppresses i

        alive0 = jnp.logical_not(rows_sup) & rows_valid

        def fix_cond(st):
            alive, changed, it = st
            return changed & (it < T)

        def fix_body(st):
            alive, _, it = st
            killed = jnp.any(over & alive[:, None], axis=0)
            new_alive = alive0 & jnp.logical_not(killed)
            return new_alive, jnp.any(new_alive != alive), it + 1

        alive, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (alive0, jnp.bool_(True), 0))

        # surviving rows suppress every later candidate
        col = jnp.arange(Np)
        later = col[None, :] > (r0 + jnp.arange(T))[:, None]
        kill = jnp.any(alive[:, None] & (iou_rows > iou_threshold) & later, axis=0)
        sup = sup | kill
        # write back the block's own suppression state
        sup = jax.lax.dynamic_update_slice(sup, jnp.logical_not(alive) |
                                           jax.lax.dynamic_slice(sup, (r0,), (T,)),
                                           (r0,))
        return sup

    sup = jax.lax.fori_loop(0, nb, block_body, jnp.zeros(Np, bool))
    sup = sup[:N]
    b = b[:N]
    s = s[:N]
    keep = jnp.logical_not(sup) & (s > NEG_INF / 2)

    rank_score = jnp.where(keep, s, NEG_INF)
    k = min(max_out, N)  # fewer candidates than requested -> pad below
    _, top = jax.lax.top_k(rank_score, k)
    mask = keep[top]
    res = NMSResult(b[top], jnp.where(mask, s[top], NEG_INF), order[top], mask)
    if k < max_out:
        pad = max_out - k
        res = NMSResult(
            jnp.concatenate([res.boxes, jnp.zeros((pad, 4), res.boxes.dtype)]),
            jnp.concatenate([res.scores, jnp.full((pad,), NEG_INF,
                                                  res.scores.dtype)]),
            jnp.concatenate([res.idx, jnp.zeros((pad,), res.idx.dtype)]),
            jnp.concatenate([res.mask, jnp.zeros((pad,), bool)]))
    return res


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


def nms_match(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
              valid: jnp.ndarray = None):
    """Greedy NMS *grouping* (`mmcv.ops.nms_match` semantics, used by
    ScoreHLRSampler `mmdet/core/bbox/samplers/score_hlr_sampler.py:175`):
    run greedy NMS, then match every suppressed box to the keeper that
    suppressed it — in greedy order that is the highest-scored keeper
    overlapping it above the threshold.

    Fixed-shape formulation: greedy survivorship is the fixpoint of
    iterated suppression over the full score-ordered IoU matrix (same
    recurrence as the in-block step of `nms`, here over all N rows since
    match callers run at sampler sizes, N <= ~2k); the leader/rank maps
    are then masked argmax / comparison-count reductions — no gathers.

    Returns (leader, rank, keep): ``leader[i]`` = index of i's group
    leader (itself if kept; arbitrary for invalid), ``rank[i]`` = 0-based
    score rank within the group (leader = 0), ``keep[i]`` = survived NMS.
    """
    N = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    ok = scores > NEG_INF / 2
    iou = _pairwise_iou(boxes, boxes)
    # strict score order with index tiebreak (greedy processes ties by
    # original order, matching the reference's stable sort)
    higher = (scores[:, None] < scores[None, :]) | \
        ((scores[:, None] == scores[None, :]) &
         (jnp.arange(N)[:, None] > jnp.arange(N)[None, :]))
    over = (iou > iou_threshold) & higher & ok[:, None] & ok[None, :]

    def fix_cond(st):
        _, changed, it = st
        return changed & (it < N)

    def fix_body(st):
        alive, _, it = st
        killed = jnp.any(over & alive[None, :], axis=1)
        new_alive = ok & jnp.logical_not(killed)
        return new_alive, jnp.any(new_alive != alive), it + 1

    keep, _, _ = jax.lax.while_loop(fix_cond, fix_body,
                                    (ok, jnp.bool_(True), 0))

    # leader(i): kept j maximizing score_j among overlaps > thr (self for
    # kept boxes since iou(i,i)=1 > thr)
    cand = (iou > iou_threshold) & keep[None, :]
    lead_score = jnp.where(cand, scores[None, :], NEG_INF)
    leader = jnp.argmax(lead_score, axis=1)
    same_group = (leader[:, None] == leader[None, :]) & ok[None, :]
    rank = (same_group & higher).sum(axis=1)
    return leader, rank, keep


class DetResult(NamedTuple):
    boxes: jnp.ndarray    # (K, 4)
    scores: jnp.ndarray   # (K,)
    labels: jnp.ndarray   # (K,) int32
    mask: jnp.ndarray     # (K,) bool


# allow jax.export artifacts whose output tree contains these result tuples
# (tools/export_model.py --format exported; tests/test_export.py)
try:
    import jax.export as _jax_export
    _jax_export.register_namedtuple_serialization(
        NMSResult, serialized_name="panoswin_tpu.NMSResult")
    _jax_export.register_namedtuple_serialization(
        DetResult, serialized_name="panoswin_tpu.DetResult")
except Exception:  # pragma: no cover - older jax without export registry
    pass


def multiclass_nms(multi_boxes: jnp.ndarray, multi_scores: jnp.ndarray,
                   score_thr: float, iou_threshold: float,
                   max_per_img: int, pre_nms: int = 2000,
                   valid: jnp.ndarray = None,
                   nms_type: str = "nms") -> DetResult:
    """Class-wise NMS over decoded boxes (`bbox_nms.py:7 multiclass_nms`).

    multi_boxes: (N, 4) or (N, C*4); multi_scores: (N, C+1) with background
    last (dropped).  Candidates below `score_thr` are masked; the top
    `pre_nms` candidates across all classes enter batched NMS.
    nms_type "soft_nms" routes through score-decay Soft-NMS
    (configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py).
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

    if nms_type == "soft_nms":
        # class-offset trick keeps classes independent under soft decay
        max_coord = jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0)) + 1.0
        shifted = top_boxes + top_labels.astype(top_boxes.dtype)[:, None] * max_coord
        r = soft_nms(shifted, top_scores, iou_threshold, max_per_img,
                     valid=top_valid)
        r = NMSResult(top_boxes[r.idx], r.scores, r.idx, r.mask)
    else:
        r = batched_nms(top_boxes, top_scores, top_labels, iou_threshold,
                        max_per_img, top_valid)
    labels = top_labels[r.idx]
    return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                     jnp.where(r.mask, labels, -1), r.mask)


def fast_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             max_per_img: int, top_k: int = 200, score_thr: float = 0.05,
             coeffs: jnp.ndarray = None, valid: jnp.ndarray = None):
    """YOLACT Fast NMS (`mmdet/core/post_processing/bbox_nms.py:96`).

    Unlike greedy NMS, an already-suppressed box may still suppress others
    — which makes the whole decision one upper-triangular IoU-max per
    class, i.e. pure batched matrix ops with zero sequential depth: the
    natural TPU formulation (the reference keeps it for the same reason on
    GPU).

    boxes (N, 4) shared across classes; scores (N, C) foreground only;
    coeffs optional (N, D) rides along (YOLACT mask coefficients).
    Returns (DetResult, coeffs (max_per_img, D) or None).
    """
    N, C = scores.shape
    sc = scores.T                                          # (C, N)
    if valid is not None:
        sc = jnp.where(valid[None, :], sc, NEG_INF)
    k = min(top_k, N)
    top_s, idx = jax.lax.top_k(sc, k)                      # (C, k) sorted
    bx = boxes[idx.reshape(-1)].reshape(C, k, 4)
    iou = jax.vmap(_pairwise_iou)(bx, bx)                  # (C, k, k)
    tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # row above col
    iou_max = jnp.where(tri, iou, 0.0).max(axis=1)         # (C, k)
    keep = (iou_max <= iou_threshold) & (top_s > score_thr)

    flat_s = jnp.where(keep, top_s, NEG_INF).reshape(-1)   # (C*k,)
    out_s, sel = jax.lax.top_k(flat_s, max_per_img)
    out_mask = out_s > NEG_INF / 2
    out_boxes = bx.reshape(-1, 4)[sel]
    out_labels = (sel // k).astype(jnp.int32)
    out_coeffs = None
    if coeffs is not None:
        cf = coeffs[idx.reshape(-1)].reshape(C, k, -1)
        out_coeffs = cf.reshape(C * k, -1)[sel]
    det = DetResult(out_boxes, jnp.where(out_mask, out_s, NEG_INF),
                    jnp.where(out_mask, out_labels, -1), out_mask)
    return det, out_coeffs


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
             max_out: int, sigma: float = 0.5, min_score: float = 1e-3,
             valid: jnp.ndarray = None, method: str = "gaussian") -> NMSResult:
    """Soft-NMS (`mmcv.ops.soft_nms` role): decays overlapping scores
    (gaussian or linear) instead of hard suppression.  Sequential greedy
    over `max_out` selections — only the selection count, not N, bounds the
    loop depth."""
    N = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    def body(_, st):
        s, out_idx, out_sc, t = st
        i = jnp.argmax(s)
        si = s[i]
        out_idx = out_idx.at[t].set(i)
        out_sc = out_sc.at[t].set(si)
        s = s.at[i].set(NEG_INF)
        iou_row = _pairwise_iou(boxes[i][None], boxes)[0]
        if method == "linear":
            decay = jnp.where(iou_row > iou_threshold, 1.0 - iou_row, 1.0)
        else:
            decay = jnp.exp(-(iou_row ** 2) / sigma)
        s = jnp.where(s > NEG_INF / 2, s * decay, s)
        return s, out_idx, out_sc, t + 1

    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_sc = jnp.full((max_out,), NEG_INF)
    s, out_idx, out_sc, _ = jax.lax.fori_loop(
        0, max_out, body, (scores, out_idx, out_sc, 0))
    mask = out_sc > jnp.maximum(min_score, NEG_INF / 2)
    return NMSResult(boxes[out_idx], out_sc, out_idx, mask)
