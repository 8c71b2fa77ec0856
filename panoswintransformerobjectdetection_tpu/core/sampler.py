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
                  pos_fraction: float) -> SampleResult:
    """assigned: (N,) from `max_iou_assign` (-1 ignore / 0 neg / g+1 pos)."""
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
