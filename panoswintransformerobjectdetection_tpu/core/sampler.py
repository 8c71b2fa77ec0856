"""Fixed-shape random pos/neg sampling.

Semantics of mmdet `RandomSampler` (`mmdet/core/bbox/samplers/random_sampler.py:8`):
up to num*pos_fraction positives chosen uniformly at random; the remaining
quota filled with random negatives.  Fixed-shape rewrite: scores = uniform
noise + class boost, top-k per class, then a cumsum mask caps the negative
count at (num - n_pos) so the sampled set has exactly min(n_pos, pos_cap) +
min(n_neg_avail, num - n_pos) elements, like the reference.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    pos_inds: jnp.ndarray    # (pos_cap,) anchor indices (padded arbitrary)
    pos_mask: jnp.ndarray    # (pos_cap,) bool
    neg_inds: jnp.ndarray    # (num,) anchor indices
    neg_mask: jnp.ndarray    # (num,) bool


def random_sample(rng: jax.Array, assigned: jnp.ndarray, num: int,
                  pos_fraction: float, neg_pos_ub: int = -1) -> SampleResult:
    """assigned: (N,) from `max_iou_assign` (-1 ignore / 0 neg / g+1 pos).

    neg_pos_ub >= 0 caps negatives at ``neg_pos_ub * max(1, n_pos)``
    (`samplers/base_sampler.py sample` upper bound; the Libra rpn recipe
    sets 5).
    """
    N = assigned.shape[0]
    pos_cap = int(num * pos_fraction)
    k_pos, k_neg = jax.random.split(rng)

    is_pos = assigned > 0
    is_neg = assigned == 0

    pos_score = jax.random.uniform(k_pos, (N,)) + is_pos * 2.0
    _, pos_inds = jax.lax.top_k(pos_score, pos_cap)
    pos_mask = is_pos[pos_inds]
    n_pos = pos_mask.sum()

    neg_score = jax.random.uniform(k_neg, (N,)) + is_neg * 2.0
    _, neg_inds = jax.lax.top_k(neg_score, num)
    neg_avail = is_neg[neg_inds]
    neg_quota = num - n_pos
    if neg_pos_ub >= 0:
        neg_quota = jnp.minimum(neg_quota, neg_pos_ub * jnp.maximum(n_pos, 1))
    keep = jnp.cumsum(neg_avail.astype(jnp.int32)) <= neg_quota
    neg_mask = neg_avail & keep

    return SampleResult(pos_inds, pos_mask, neg_inds, neg_mask)


def pseudo_sample(assigned: jnp.ndarray, num: int) -> SampleResult:
    """PseudoSampler (`samplers/pseudo_sampler.py`): take everything — all
    positives (up to `num` slots) and all negatives, no subsampling."""
    N = assigned.shape[0]
    is_pos = assigned > 0
    is_neg = assigned == 0
    pos_score = is_pos.astype(jnp.float32)
    _, pos_inds = jax.lax.top_k(pos_score, min(num, N))
    pos_mask = is_pos[pos_inds]
    neg_score = is_neg.astype(jnp.float32)
    _, neg_inds = jax.lax.top_k(neg_score, min(num, N))
    neg_mask = is_neg[neg_inds]
    return SampleResult(pos_inds, pos_mask, neg_inds, neg_mask)


def _within_group_rank(rng: jax.Array, group_id: jnp.ndarray,
                       member: jnp.ndarray) -> jnp.ndarray:
    """Random 0-based rank of each member within its group.

    Scatter-free O(N^2) masked-comparison formulation (gathers/scatters
    lower poorly on this TPU backend; an N x N bool reduction is a cheap
    vectorized op at sampler sizes).  Non-members rank N.
    """
    N = group_id.shape[0]
    key = jax.random.uniform(rng, (N,))
    same = (group_id[None, :] == group_id[:, None]) & member[None, :]
    before = same & (key[None, :] < key[:, None])
    return jnp.where(member, before.sum(axis=-1), N)


def instance_balanced_pos_sample(rng: jax.Array, assigned: jnp.ndarray,
                                 num: int, pos_fraction: float):
    """InstanceBalancedPosSampler (`samplers/instance_balanced_pos_sampler.py:9`):
    positives drawn round-robin across gt instances — up to
    ``round(pos_cap / num_gts) + 1`` per instance first, then random
    extras.  Fixed-shape: a random within-instance rank turns the per-gt
    cap into a priority tier; top-k over tiered scores reproduces the
    (cap per gt -> random fill) ordering.

    Returns (pos_inds, pos_mask) shaped (pos_cap,).
    """
    N = assigned.shape[0]
    pos_cap = int(num * pos_fraction)
    k_rank, k_pick = jax.random.split(rng)
    is_pos = assigned > 0
    rank = _within_group_rank(k_rank, assigned, is_pos)
    num_gts = jnp.maximum(((rank == 0) & is_pos).sum(), 1)
    num_per_gt = jnp.round(pos_cap / num_gts).astype(jnp.int32) + 1
    primary = is_pos & (rank < num_per_gt)
    score = jax.random.uniform(k_pick, (N,)) + is_pos * 2.0 + primary * 2.0
    _, pos_inds = jax.lax.top_k(score, pos_cap)
    return pos_inds, is_pos[pos_inds]


def iou_balanced_neg_sample(rng: jax.Array, assigned: jnp.ndarray,
                            max_ious: jnp.ndarray, num: int,
                            n_pos: jnp.ndarray, *, floor_thr: float = -1.0,
                            floor_fraction: float = 0.0, num_bins: int = 3):
    """IoUBalancedNegSampler (`samplers/iou_balanced_neg_sampler.py:9`,
    Libra R-CNN): negatives above `floor_thr` are drawn evenly from
    `num_bins` IoU intervals spanning [floor_thr, max_iou); the floor set
    fills a `floor_fraction` share randomly; leftovers random.

    Fixed-shape: per-bin random ranks cap each bin at its quota (priority
    tier 3), floor negatives tier 2, remaining negatives tier 1; a cumsum
    over the top-k then caps the total at ``num - n_pos``.  Sole deviation
    from the reference: the single highest-IoU negative lands in the last
    bin instead of outside every half-open interval.

    Returns (neg_inds, neg_mask) shaped (num,).
    """
    N = assigned.shape[0]
    is_neg = assigned == 0
    neg_quota = num - n_pos
    k_rank, k_pick = jax.random.split(rng)

    if floor_thr > 0:
        floor_set = is_neg & (max_ious < floor_thr)
        iou_set = is_neg & (max_ious >= floor_thr)
        floor = floor_thr
    elif floor_thr == 0:
        floor_set = is_neg & (max_ious == 0)
        iou_set = is_neg & (max_ious > 0)
        floor = 0.0
    else:
        floor_set = jnp.zeros_like(is_neg)
        iou_set = is_neg
        floor = 0.0

    max_iou = jnp.max(jnp.where(iou_set, max_ious, 0.0))
    interval = jnp.maximum((max_iou - floor) / num_bins, 1e-12)
    bin_id = jnp.clip(jnp.floor((max_ious - floor) / interval),
                      0, num_bins - 1).astype(jnp.int32)
    rank = _within_group_rank(k_rank, bin_id, iou_set)
    per_bin = jnp.floor((1.0 - floor_fraction) * neg_quota / num_bins)
    primary = iou_set & (rank < per_bin)

    score = (jax.random.uniform(k_pick, (N,)) + is_neg * 2.0
             + floor_set * 2.0 + primary * 4.0)
    k = min(num, N)
    _, neg_inds = jax.lax.top_k(score, k)
    if k < num:       # fewer candidates than slots: pad (masked) to num
        neg_inds = jnp.concatenate([neg_inds, jnp.zeros(num - k, neg_inds.dtype)])
    avail = is_neg[neg_inds]
    if k < num:
        avail = avail & (jnp.arange(num) < k)
    keep = jnp.cumsum(avail.astype(jnp.int32)) <= neg_quota
    return neg_inds, avail & keep


def combined_sample(rng: jax.Array, assigned: jnp.ndarray,
                    max_ious: jnp.ndarray, num: int, pos_fraction: float,
                    *, pos_sampler: str = "instance_balanced",
                    neg_sampler: str = "iou_balanced",
                    floor_thr: float = -1.0, floor_fraction: float = 0.0,
                    num_bins: int = 3) -> SampleResult:
    """CombinedSampler (`samplers/combined_sampler.py`): independent pos/neg
    sampler choice.  The Libra R-CNN recipe pairs InstanceBalancedPos with
    IoUBalancedNeg (`configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py:32-41`).
    """
    N = assigned.shape[0]
    pos_cap = int(num * pos_fraction)
    k_pos, k_neg = jax.random.split(rng)
    if pos_sampler == "instance_balanced":
        pos_inds, pos_mask = instance_balanced_pos_sample(
            k_pos, assigned, num, pos_fraction)
    else:
        is_pos = assigned > 0
        score = jax.random.uniform(k_pos, (N,)) + is_pos * 2.0
        _, pos_inds = jax.lax.top_k(score, pos_cap)
        pos_mask = is_pos[pos_inds]
    n_pos = pos_mask.sum()
    if neg_sampler == "iou_balanced":
        neg_inds, neg_mask = iou_balanced_neg_sample(
            k_neg, assigned, max_ious, num, n_pos, floor_thr=floor_thr,
            floor_fraction=floor_fraction, num_bins=num_bins)
    else:
        is_neg = assigned == 0
        score = jax.random.uniform(k_neg, (N,)) + is_neg * 2.0
        _, neg_inds = jax.lax.top_k(score, num)
        avail = is_neg[neg_inds]
        neg_mask = avail & (jnp.cumsum(avail.astype(jnp.int32)) <= num - n_pos)
    return SampleResult(pos_inds, pos_mask, neg_inds, neg_mask)


def ohem_sample(assigned: jnp.ndarray, losses_per_anchor: jnp.ndarray,
                num: int, pos_fraction: float) -> SampleResult:
    """OHEM (`samplers/ohem_sampler.py`): keep the hardest (highest-loss)
    positives/negatives instead of random ones."""
    N = assigned.shape[0]
    pos_cap = int(num * pos_fraction)
    is_pos = assigned > 0
    is_neg = assigned == 0

    pos_score = jnp.where(is_pos, losses_per_anchor, -jnp.inf)
    _, pos_inds = jax.lax.top_k(pos_score, pos_cap)
    pos_mask = is_pos[pos_inds]
    n_pos = pos_mask.sum()

    neg_score = jnp.where(is_neg, losses_per_anchor, -jnp.inf)
    _, neg_inds = jax.lax.top_k(neg_score, num)
    neg_avail = is_neg[neg_inds]
    keep = jnp.cumsum(neg_avail.astype(jnp.int32)) <= num - n_pos
    return SampleResult(pos_inds, pos_mask, neg_inds, neg_avail & keep)
