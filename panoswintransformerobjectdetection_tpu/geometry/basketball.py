"""Basketball ("scalp") transform: latitude-dependent per-patch rescaling.

Redesign of `lzx/lzx_augs/basketball_transform_torchcuda.py`: each
patch-row of an equirect image is horizontally shrunk by cos(latitude)
(patches near the poles cover less longitude on the sphere), centered in
its patch, padding elsewhere.  The reference loops over unique target
widths calling `F.interpolate` per group (`correct_center:92`); here the
whole warp is ONE precomputed gather map applied with `take_along_axis` —
batched, jit-friendly, no data-dependent shapes.
"""

import math
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

PI = math.pi


def patch_latitudes(h: int, patch_size: int,
                    ratio_v: Sequence[float] = (0.0, 1.0)) -> np.ndarray:
    """v coordinate of each patch-row center (`get_v_all_patches:53`).

    gap_uv = patch/H * pi * (v1 - v0); v = (i + 0.5) * gap_uv + (v0 - 0.5) pi.
    """
    n_py = -(-h // patch_size)
    gap_uv = patch_size / h * PI * (ratio_v[1] - ratio_v[0])
    return (np.arange(n_py) + 0.5) * gap_uv + (ratio_v[0] - 0.5) * PI


def stb_adjacency(shape_hw: Tuple[int, int], patch_size: int,
                  ratio_v: Sequence[float] = (0.0, 1.0)) -> Tuple[bool, bool, bool]:
    """(side, top, bottom) sphere-adjacency flags (`stb_adj_info:37`):
    does the pano wrap at the seam / touch the north / south pole?"""
    h, w = shape_hw
    gap_uv = patch_size / h * PI * (ratio_v[1] - ratio_v[0])
    u_len = w / patch_size * gap_uv
    return (u_len + 0.5 * gap_uv > 2 * PI,
            ratio_v[0] < 1e-5,
            ratio_v[1] + 1e-5 > 1.0)


def correct_center_map(h: int, w: int, patch_size: int,
                       ratio_v: Sequence[float] = (0.0, 1.0)):
    """Precompute the (H, W) x-gather map + validity mask for the
    latitude rescale (static numpy; depends only on shape/patch/ratio).

    Per patch row with target width s = round(cos(v) * p): output local
    col t in [start, start+s) reads input local col floor((t-start)*p/s)
    (F.interpolate nearest), others are padding.
    """
    p = patch_size
    vs = patch_latitudes(h, p, ratio_v)
    n_py = len(vs)
    sizes = np.round(np.cos(vs) * p).astype(int)

    local = np.arange(p)
    src_local = np.zeros((n_py, p), np.int64)
    valid = np.zeros((n_py, p), bool)
    for i, s in enumerate(sizes):
        if s < 1:
            continue
        start = (p - s) // 2
        t = local - start
        ok = (t >= 0) & (t < s)
        src = np.clip((t * p) // s, 0, p - 1)
        src_local[i] = np.where(ok, src, 0)
        valid[i] = ok

    gx = np.zeros((h, w), np.int64)
    vmask = np.zeros((h, w), bool)
    for y in range(h):
        row = min(y // p, n_py - 1)
        base = (np.arange(w) // p) * p
        gx[y] = np.minimum(base + src_local[row][np.arange(w) % p], w - 1)
        vmask[y] = valid[row][np.arange(w) % p]
    return gx, vmask


def correct_center(img: jnp.ndarray, patch_size: int,
                   ratio_v: Sequence[float] = (0.0, 1.0),
                   padding_value: float = 0.0) -> jnp.ndarray:
    """Apply the basketball latitude rescale.  img: (..., H, W, C) NHWC."""
    h, w = img.shape[-3], img.shape[-2]
    gx, vmask = correct_center_map(h, w, patch_size, ratio_v)
    gxj = jnp.asarray(gx)
    out = jnp.take_along_axis(
        img, gxj.reshape((1,) * (img.ndim - 3) + (h, w, 1)), axis=-2)
    return jnp.where(jnp.asarray(vmask)[..., None], out, padding_value)
