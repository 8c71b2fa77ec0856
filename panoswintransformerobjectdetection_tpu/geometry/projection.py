"""Gnomonic (tangent-plane) <-> equirectangular projection and BFoV boxes.

Redesign of `lzx/tangent_and_equirectangular.py` and the 360-Indoor BFoV box
conversion in `lzx/indoor360/view_pano.py`: batched jnp, with the polygon
sampling of box edges done as one vectorized op per box batch.
"""

import math

import jax.numpy as jnp

from .sphere import wrap_u

PI = math.pi


def tangent_xy_to_equirect_uv(xy: jnp.ndarray, uv0: jnp.ndarray) -> jnp.ndarray:
    """Inverse gnomonic projection centered at uv0.

    xy: (..., 2) tangent-plane coords; uv0: (..., 2) or (2,) tangent point.
    Mirrors `lzx/tangent_and_equirectangular.py:13`.
    """
    uv0 = jnp.broadcast_to(uv0, xy.shape[:-1] + (2,))
    u0, v0 = uv0[..., 0], uv0[..., 1]
    x, y = xy[..., 0], xy[..., 1]
    rho = jnp.maximum(jnp.sqrt(x * x + y * y), 1e-8)
    t = jnp.arctan(rho)
    st, ct = jnp.sin(t), jnp.cos(t)
    u = u0 + jnp.arctan2(x * st, rho * jnp.cos(v0) * ct - y * jnp.sin(v0) * st)
    v = jnp.arcsin(jnp.clip(ct * jnp.sin(v0) + y * st * jnp.cos(v0) / rho, -1.0, 1.0))
    return jnp.stack([u, v], axis=-1)


def equirect_uv_to_tangent_xy(uv: jnp.ndarray, uv0: jnp.ndarray) -> jnp.ndarray:
    """Forward gnomonic projection centered at uv0 (reference `:31`)."""
    uv0 = jnp.broadcast_to(uv0, uv.shape[:-1] + (2,))
    u0, v0 = uv0[..., 0], uv0[..., 1]
    u, v = uv[..., 0], uv[..., 1]
    cosc = jnp.sin(v0) * jnp.sin(v) + jnp.cos(v0) * jnp.cos(v) * jnp.cos(u - u0)
    x = jnp.cos(v) * jnp.sin(u - u0) / cosc
    y = (jnp.cos(v0) * jnp.sin(v) - jnp.sin(v0) * jnp.cos(v) * jnp.cos(u - u0)) / cosc
    return jnp.stack([x, y], axis=-1)


def _edge_samples(n: int) -> jnp.ndarray:
    """(4n, 2) unit-square boundary samples in [-1, 1]^2 (box edge tracing)."""
    t = jnp.linspace(-1.0, 1.0, n)
    ones = jnp.ones_like(t)
    top = jnp.stack([t, -ones], -1)
    bot = jnp.stack([t, ones], -1)
    lef = jnp.stack([-ones, t], -1)
    rig = jnp.stack([ones, t], -1)
    return jnp.concatenate([top, bot, lef, rig], 0)


def bfov_to_xyxy(uvwh: jnp.ndarray, img_w: int, img_h: int, n_samples: int = 10) -> jnp.ndarray:
    """Convert BFoV (tangent uvwh) boxes to equirect pixel xyxy boxes.

    uvwh: (N, 4) — (u, v) tangent point in radians, (w, h) tangent-plane
    extent.  Edge points of the tangent rectangle are inverse-projected and
    their uv extent (with longitude unwrapped around the seam relative to
    the box center) is converted to pixels.  Follows the intent of
    `lzx/indoor360/view_pano.py:39 (equirectangular_bounding_xyxy)` with the
    pole/seam handling expressed as seam-relative unwrapping.
    """
    uv0 = uvwh[:, :2]
    wh = uvwh[:, 2:4]
    edge = _edge_samples(n_samples)                     # (E, 2)
    xy = edge[None, :, :] * (0.5 * wh)[:, None, :]      # (N, E, 2)
    uv = tangent_xy_to_equirect_uv(xy, uv0[:, None, :])  # (N, E, 2)

    # unwrap u around each box's center so seam-crossing boxes stay contiguous
    du = wrap_u(uv[..., 0] - uv0[:, None, 0])
    u = uv0[:, None, 0] + du
    v = uv[..., 1]

    u_min, u_max = u.min(1), u.max(1)
    v_min, v_max = v.min(1), v.max(1)

    # poles: if the box contains a pole, longitude covers the full circle
    north = (v_min <= -0.5 * PI + 1e-6)
    south = (v_max >= 0.5 * PI - 1e-6)
    u_min = jnp.where(north | south, -PI, u_min)
    u_max = jnp.where(north | south, PI, u_max)

    sx = img_w / (2.0 * PI)
    sy = img_h / PI
    x1 = (u_min + PI) * sx
    x2 = (u_max + PI) * sx
    y1 = (v_min + 0.5 * PI) * sy
    y2 = (v_max + 0.5 * PI) * sy
    return jnp.stack([x1, y1, x2, y2], axis=-1)
