"""Great-circle rotation of equirectangular coordinates and images.

TPU-native redesign of `lzx/pano_rotate.py`: fully vectorized (no python
loops over points), jit-safe (the reference's early-return for a south-pole
axis becomes a `jnp.where` select), and image resampling goes through the
batched bilinear gather in `resample.py` instead of `F.grid_sample`.
"""

import math

import jax.numpy as jnp

from .sphere import uv_to_xyz, wrap_u
from .resample import grid_sample

PI = math.pi

# Reference `lzx/pano_rotate.py:13`: NORTH_POLE = (0, -pi/2) (top of the pano).
NORTH_POLE = (0.0, -0.5 * PI)

_EPS = 1e-15


def _normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def rotate_to_pole(np_uv: jnp.ndarray, s_uv: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Rotate the sphere so the point `np_uv` becomes the north pole.

    Mirrors `lzx/pano_rotate.py:30 (rotate)`:
      new latitude from the chord distance to the target pole;
      new longitude measured in the tangent frame anchored at the current
      north pole's image (the reference appends (0, -pi/2) to the batch to
      get this anchor; here it is computed in closed form).

    np_uv: (2,), s_uv: (..., 2) -> (..., 2).
    """
    np_xyz = uv_to_xyz(np_uv[None, :])[0]              # (3,)
    s_xyz = uv_to_xyz(s_uv)                            # (..., 3)
    sp_xyz = uv_to_xyz(jnp.asarray(NORTH_POLE, dtype=s_uv.dtype)[None, :])[0]

    d = jnp.linalg.norm(np_xyz - s_xyz, axis=-1)
    v_new = 2.0 * jnp.arcsin(jnp.clip(0.5 * d, -1.0, 1.0)) - 0.5 * PI

    directions = _normalize(jnp.cross(s_xyz, jnp.broadcast_to(np_xyz, s_xyz.shape)))
    x_dir = _normalize(jnp.cross(sp_xyz, np_xyz))      # (3,)
    y_dir = jnp.cross(x_dir, np_xyz)                   # (3,)

    cosu = jnp.clip((directions * x_dir).sum(-1), -1.0 + eps, 1.0 - eps)
    u_new = jnp.arccos(cosu)
    u_new = jnp.where((directions * y_dir).sum(-1) < 0, -u_new, u_new)
    return jnp.stack([u_new, v_new], axis=-1)


def pano_rotate(np_uv: jnp.ndarray, s_uv: jnp.ndarray, reverse: bool = False,
                eps: float = _EPS) -> jnp.ndarray:
    """Rotate pano coordinates; exact inverse with `reverse=True`.

    `pano_rotate(np_uv, pano_rotate(np_uv, s_uv), reverse=True) == s_uv`
    (reference `lzx/pano_rotate.py:66`).  The reference's identity
    early-exit when np_uv is the south pole is a traced `where` here.
    """
    np_uv = jnp.asarray(np_uv, dtype=jnp.result_type(s_uv.dtype, jnp.float32))
    s_uv = jnp.asarray(s_uv)
    is_identity = jnp.abs(np_uv[1] + 0.5 * PI) < eps

    if not reverse:
        out = rotate_to_pole(np_uv, s_uv, eps)
    else:
        pole = rotate_to_pole(np_uv, jnp.asarray(NORTH_POLE, s_uv.dtype)[None, :], eps)[0]
        out = rotate_to_pole(pole, s_uv, eps)
        u = wrap_u(out[..., 0] + np_uv[0])
        out = jnp.stack([u, out[..., 1]], axis=-1)
    return jnp.where(is_identity, s_uv, out)


def pano_rotate_image(img_bchw: jnp.ndarray, np_uv: jnp.ndarray):
    """Warp an equirectangular image batch by a great-circle rotation.

    For each output pixel's uv, sample the input at `pano_rotate(np_uv, uv)`
    (reference `lzx/pano_rotate.py:169 (pano_rotate_image)`): mesh built as
    u = (j/H - 1) * pi, v = (i/H - 0.5) * pi (W == 2H assumed, no half-pixel
    offset), bilinear border-padded sampling with align_corners=False.

    img_bchw: (B, C, H, W) -> (rotated (B, C, H, W), sample grid (H, W, 2)).
    The grid is returned so callers (pitch attention) can resample side-band
    uv maps identically.
    """
    B, C, H, W = img_bchw.shape
    i = jnp.arange(H, dtype=jnp.float32) / H - 0.5
    j = jnp.arange(W, dtype=jnp.float32) / H - 1.0
    mesh_u = jnp.broadcast_to(j[None, :], (H, W)) * PI
    mesh_v = jnp.broadcast_to(i[:, None], (H, W)) * PI
    s_uv = jnp.stack([mesh_u, mesh_v], axis=-1).reshape(-1, 2)
    rot = pano_rotate(jnp.asarray(np_uv, jnp.float32), s_uv, reverse=False)
    eps = 5e-4
    gx = jnp.clip(rot[:, 0] / PI, eps - 1.0, 1.0 - eps)
    gy = jnp.clip(rot[:, 1] / PI * 2.0, eps - 1.0, 1.0 - eps)
    grid = jnp.stack([gx, gy], axis=-1).reshape(H, W, 2)
    out = grid_sample(img_bchw, jnp.broadcast_to(grid[None], (B, H, W, 2)),
                      padding_mode="border", align_corners=False)
    return out, grid
