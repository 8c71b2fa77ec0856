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
