"""`mmcv.ops.point_sample` role: sample features at normalized points —
exactly our torch-semantics grid_sample."""

import jax.numpy as jnp

from ..geometry.resample import grid_sample_nhwc


def point_sample(feats: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False) -> jnp.ndarray:
    """feats: (B, H, W, C); points: (B, P, 2) in [0, 1] xy.
    Returns (B, P, C)."""
    grid = points[:, :, None, :] * 2.0 - 1.0            # (B, P, 1, 2)
    out = grid_sample_nhwc(feats, grid, padding_mode="zeros",
                           align_corners=align_corners)
    return out[:, :, 0, :]
