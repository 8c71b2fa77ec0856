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


def correct_center_traced(img: jnp.ndarray, patch_size: int,
                          ratio_v0, ratio_v1, ori_h,
                          padding_value: float = 0.0) -> jnp.ndarray:
    """Jit-traceable basketball rescale with *traced* pano ratios.

    `correct_center` above precomputes a static numpy gather map, which
    requires concrete `ratio_v` — fine for data pipelines, unusable inside
    a jitted model where `pano_ratio_v` is batch data.  This variant
    builds the same map with jnp ops (shapes static, values traced),
    matching the reference model path
    (`panoswin_transformer.py:842-851` -> `correct_center:92` with
    `length=pano_ratio_v[i][2]`, i.e. gap_uv measured against the
    ORIGINAL image height, and `F.interpolate` nearest = floor(t*p/s)
    with torch.round half-to-even target widths).

    img: (H, W, C); ratios/ori_h: traced scalars.  Returns (H, W, C).
    """
    h, w = img.shape[0], img.shape[1]
    p = patch_size
    n_py = h // p
    gap_uv = p / ori_h * PI * (ratio_v1 - ratio_v0)
    v_rows = (jnp.arange(n_py, dtype=jnp.float32) + 0.5) * gap_uv \
        + (ratio_v0 - 0.5) * PI
    sizes = jnp.round(jnp.cos(v_rows) * p).astype(jnp.int32)   # (n_py,)

    ys = jnp.arange(h) // p                                    # (h,)
    s = sizes[ys][:, None]                                     # (h, 1)
    local = (jnp.arange(w) % p)[None, :]                       # (1, w)
    start = (p - s) // 2
    t = local - start                                          # (h, w)
    ok = (t >= 0) & (t < s) & (s >= 1)
    s_safe = jnp.maximum(s, 1)
    src = jnp.clip((t * p) // s_safe, 0, p - 1)
    gx = (jnp.arange(w)[None, :] // p) * p + src               # (h, w)
    out = jnp.take_along_axis(img, gx[..., None], axis=1)
    return jnp.where(ok[..., None], out, padding_value)
