"""Spherical / equirectangular geometry — pure jnp, batched, jit-friendly.

TPU-native re-design of the reference's ``lzx/`` pano-geometry library
(``lzx/pano_rotate.py``, ``lzx/models/great_circle.py``,
``lzx/tangent_and_equirectangular.py``, ``lzx/pano_axis_trans.py``).
All functions are pure, shape-polymorphic over leading batch dims, and
avoid per-image Python loops so XLA can fuse them.
"""

from .sphere import (
    make_uv_grid,
    uv_to_xyz,
    wrap_u,
    haversine,
    haversine_pairwise,
    great_circle,
    great_circle_pairwise,
)
from .rotate import (
    NORTH_POLE,
    rotate_to_pole,
    pano_rotate,
    pano_rotate_image,
)
from .projection import (
    tangent_xy_to_equirect_uv,
    equirect_uv_to_tangent_xy,
    bfov_to_xyxy,
)
from .resample import grid_sample, grid_sample_nhwc
from .axis import ew2ns, ns2we, pole_cat
from .basketball import correct_center, patch_latitudes, stb_adjacency

__all__ = [
    "make_uv_grid", "uv_to_xyz", "wrap_u", "haversine", "haversine_pairwise",
    "great_circle", "great_circle_pairwise", "NORTH_POLE", "rotate_to_pole",
    "pano_rotate", "pano_rotate_image", "tangent_xy_to_equirect_uv",
    "equirect_uv_to_tangent_xy", "bfov_to_xyxy", "grid_sample",
    "grid_sample_nhwc", "ew2ns", "ns2we", "pole_cat", "correct_center",
    "patch_latitudes", "stb_adjacency",
]
