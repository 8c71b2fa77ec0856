"""Core spherical math: uv grids, xyz embedding, great-circle distances.

Conventions (matching the reference, `lzx/models/great_circle.py`,
`simple_panoswin_transformer.py:make_uv_hw2`):
  u (longitude) in [-pi, pi), increasing left->right across the pano width;
  v (latitude)  in [-pi/2, pi/2), increasing top->bottom (v=-pi/2 = top row).

Everything takes jnp arrays whose last dim is 2 (= (u, v)) and is batched
over arbitrary leading dims.
"""

import math

import jax.numpy as jnp

PI = math.pi


def make_uv_grid(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """uv coordinates of an H x W equirectangular grid, shape (H, W, 2).

    Pixel centers: uv = (index + 0.5) * gap with gap = pi / H for BOTH axes
    (the reference assumes W == 2H so u spans [-pi, pi)); u offset -pi,
    v offset -pi/2.  Mirrors `simple_panoswin_transformer.py:153
    (make_uv_hw2)` exactly, including the shared gap.
    """
    gap = PI / H
    u = (jnp.arange(W, dtype=dtype) + 0.5) * gap - PI
    v = (jnp.arange(H, dtype=dtype) + 0.5) * gap - 0.5 * PI
    uu = jnp.broadcast_to(u[None, :], (H, W))
    vv = jnp.broadcast_to(v[:, None], (H, W))
    return jnp.stack([uu, vv], axis=-1)


def uv_to_xyz(uv: jnp.ndarray, r: float = 1.0) -> jnp.ndarray:
    """Embed uv on the unit sphere, rotation convention of `lzx/pano_rotate.py:16`.

    x = sin(u) sin(v + pi/2)
    y = cos(u) sin(v + pi/2)
    z = cos(v + pi/2)

    The (v + pi/2) form is kept literally rather than simplified to
    (cos v, -sin v): when a rotation axis sits exactly on a pole the
    azimuth frame in `rotate_to_pole` is defined only by the tiny float
    residues of these sines/cosines, and the round-trip property holds
    numerically only with the reference's exact formulation.
    """
    u = uv[..., 0]
    v2 = uv[..., 1] + 0.5 * PI
    sv = jnp.sin(v2)
    x = jnp.sin(u) * sv
    y = jnp.cos(u) * sv
    z = jnp.cos(v2)
    return jnp.stack([x, y, z], axis=-1) * r


def wrap_u(u: jnp.ndarray) -> jnp.ndarray:
    """Wrap longitudes into (-pi, pi] (reference `u_correct`).

    Example:
        >>> import jax.numpy as jnp
        >>> round(float(wrap_u(jnp.asarray(4.0))), 4)  # 4 rad -> 4 - 2*pi
        -2.2832
    """
    u = jnp.where(u > PI, u - 2.0 * PI, u)
    u = jnp.where(u <= -PI, u + 2.0 * PI, u)
    return u


def great_circle_pairwise(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise great-circle distance between matched rows (..., 2) -> (...).

    arccos form (`great_circle_pairwise`, `lzx/models/great_circle.py:20`).
    """
    u1, v1 = uv1[..., 0], uv1[..., 1]
    u2, v2 = uv2[..., 0], uv2[..., 1]
    c = jnp.cos(v1) * jnp.cos(v2) * jnp.cos(u2 - u1) + jnp.sin(v1) * jnp.sin(v2)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def great_circle(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs arccos great-circle distance: (..., N, 2), (..., M, 2) -> (..., N, M)."""
    u1 = uv1[..., 0][..., :, None]
    v1 = uv1[..., 1][..., :, None]
    u2 = uv2[..., 0][..., None, :]
    v2 = uv2[..., 1][..., None, :]
    c = jnp.cos(v1) * jnp.cos(v2) * jnp.cos(u1 - u2) + jnp.sin(v1) * jnp.sin(v2)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


def haversine_pairwise(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise haversine distance between matched rows (..., 2) -> (...)."""
    u1, v1 = uv1[..., 0], uv1[..., 1]
    u2, v2 = uv2[..., 0], uv2[..., 1]
    h = jnp.sin(0.5 * jnp.abs(v2 - v1)) ** 2 + \
        jnp.cos(v2) * jnp.cos(v1) * jnp.sin(0.5 * (u2 - u1)) ** 2
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


def haversine(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs haversine distance: (..., N, 2), (..., M, 2) -> (..., N, M).

    The inner loop of every PanoSwin attention block (reference
    `haversine22`, `lzx/models/great_circle.py:74`); numerically stabler
    than the arccos form near zero.

    Example:
        >>> import jax.numpy as jnp
        >>> a = jnp.array([[0.0, 0.0]])          # (lon, lat) on the equator
        >>> b = jnp.array([[jnp.pi / 2, 0.0]])   # quarter turn away
        >>> round(float(haversine(a, b)[0, 0]), 5)
        1.5708
    """
    v1 = uv1[..., 1][..., :, None]
    u1 = uv1[..., 0][..., :, None]
    v2 = uv2[..., 1][..., None, :]
    u2 = uv2[..., 0][..., None, :]
    h = jnp.sin(0.5 * jnp.abs(v2 - v1)) ** 2 + \
        jnp.cos(v2) * jnp.cos(v1) * jnp.sin(0.5 * (u2 - u1)) ** 2
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))
