"""Corner pooling (`mmcv.ops.CornerPool` role, CornerNet).

Directional running-max over a feature map — exactly `lax.cummax` along
the spatial axis (reversed for right/bottom), so it is a single fused XLA
scan instead of a CUDA kernel.
"""

import jax
import jax.numpy as jnp


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """x: (B, H, W, C).  direction in {'top', 'bottom', 'left', 'right'}.

    'top': out[i] = max(x[i:]) along H (information flows upward), etc.
    """
    if direction == "top":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    if direction == "bottom":
        return jax.lax.cummax(x, axis=1)
    if direction == "left":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    if direction == "right":
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


def tl_pool(x):
    """Top-left corner pooling: top + left."""
    return corner_pool(x, "top") + corner_pool(x, "left")


def br_pool(x):
    """Bottom-right corner pooling: bottom + right."""
    return corner_pool(x, "bottom") + corner_pool(x, "right")
