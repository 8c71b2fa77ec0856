"""CARAFE content-aware upsampling (`mmcv.ops.CARAFEPack` role).

Reassembly kernels are predicted per output position (softmax over k*k),
and each upsampled pixel is the kernel-weighted sum of its source
neighborhood — expressed as k*k shifted views + einsum, no CUDA unfold.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def carafe(x: jnp.ndarray, kernels: jnp.ndarray, up: int = 2,
           k: int = 5) -> jnp.ndarray:
    """x: (B, H, W, C); kernels: (B, H*up, W*up, k*k) pre-softmax.
    Returns (B, H*up, W*up, C)."""
    B, H, W, C = x.shape
    w = jax.nn.softmax(kernels, axis=-1)
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # k*k shifted source views at low resolution
    views = jnp.stack([xp[:, dy:dy + H, dx:dx + W]
                       for dy in range(k) for dx in range(k)], axis=3)
    # (B, H, W, k*k, C) -> nearest-upsample views to high res
    views = jnp.repeat(jnp.repeat(views, up, axis=1), up, axis=2)
    return jnp.einsum("bhwk,bhwkc->bhwc", w, views)


class CARAFEPack(nn.Module):
    """Kernel-prediction conv + pixel-shuffle to up-res kernels + carafe."""
    up: int = 2
    k: int = 5
    compressed: int = 64

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        c = nn.Conv(self.compressed, (1, 1), name="compress")(x)
        kp = nn.Conv(self.up * self.up * self.k * self.k, (3, 3), padding=1,
                     name="kernel_pred")(c)
        # pixel shuffle to (B, H*up, W*up, k*k)
        kp = kp.reshape(B, H, W, self.up, self.up, self.k * self.k)
        kp = kp.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, H * self.up, W * self.up, self.k * self.k)
        return carafe(x, kp, self.up, self.k)
