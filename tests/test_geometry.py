"""Geometry unit tests: property tests + numerical parity vs the reference.

Property tests mirror the reference's inline `_test*` seeds
(`lzx/pano_rotate.py:98` round-trip, distance invariance under rotation).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.geometry import (
    make_uv_grid, uv_to_xyz, haversine, great_circle, wrap_u,
    pano_rotate, pano_rotate_image, grid_sample,
    tangent_xy_to_equirect_uv, equirect_uv_to_tangent_xy,
    ew2ns, ns2we,
)
from reference_loader import load_reference

PI = math.pi
REF = load_reference()


def _rand_uv(rng, n):
    uv = (rng.random((n, 2)) - 0.5) * PI
    uv[:, 0] *= 2
    return uv.astype(np.float32)


class TestSphere:
    def test_make_uv_grid_values(self):
        # golden from reference make_uv_hw2 demo (simple_panoswin_transformer.py:162)
        g = make_uv_grid(2, 4)
        expect = np.array([
            [[-2.3562, -0.7854], [-0.7854, -0.7854], [0.7854, -0.7854], [2.3562, -0.7854]],
            [[-2.3562, 0.7854], [-0.7854, 0.7854], [0.7854, 0.7854], [2.3562, 0.7854]],
        ], dtype=np.float32)
        np.testing.assert_allclose(np.asarray(g), expect, atol=1e-4)

    def test_haversine_equals_great_circle(self, rng):
        uv1 = _rand_uv(rng, 32)
        uv2 = _rand_uv(rng, 16)
        h = np.asarray(haversine(jnp.asarray(uv1), jnp.asarray(uv2)))
        g = np.asarray(great_circle(jnp.asarray(uv1), jnp.asarray(uv2)))
        np.testing.assert_allclose(h, g, atol=1e-4)

    def test_haversine_cities(self):
        # Washington -> Beijing great-circle distance (reference _test seed)
        uv1 = jnp.array([[-77.0 / 180 * PI, 39.0 / 180 * PI]])
        uv2 = jnp.array([[116.4 / 180 * PI, 39.9 / 180 * PI]])
        d_km = float(haversine(uv1, uv2)[0, 0]) * 6400
        assert 11000 < d_km < 12000

    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    def test_haversine_parity(self, rng):
        import torch
        uv1 = _rand_uv(rng, 49)
        ref = REF["great_circle"].haversine22(torch.tensor(uv1), torch.tensor(uv1)).numpy()
        ours = np.asarray(haversine(jnp.asarray(uv1), jnp.asarray(uv1)))
        np.testing.assert_allclose(ours, ref, atol=5e-5)

    def test_wrap_u(self):
        u = jnp.array([3.5, -3.5, 0.0, PI, -PI])
        w = np.asarray(wrap_u(u))
        assert np.all(w > -PI - 1e-6) and np.all(w <= PI + 1e-6)
        np.testing.assert_allclose(w[0], 3.5 - 2 * PI, atol=1e-6)


class TestRotate:
    def test_roundtrip(self, rng):
        np_uv = jnp.array([-0.1 * PI, 0.5 * PI])
        s_uv = jnp.asarray(_rand_uv(rng, 1000) * 0.98)
        rt = pano_rotate(np_uv, pano_rotate(np_uv, s_uv), reverse=True)
        err = np.abs(np.asarray(rt) - np.asarray(s_uv))
        assert np.quantile(err, 0.99) < 1e-3, err.max()

    def test_distance_invariance(self, rng):
        np_uv = jnp.array([0.1, 0.5])
        s_uv = jnp.asarray(_rand_uv(rng, 64) * 0.9)
        rot = pano_rotate(np_uv, s_uv)
        d0 = np.asarray(haversine(s_uv, s_uv))
        d1 = np.asarray(haversine(rot, rot))
        np.testing.assert_allclose(d0, d1, atol=1e-3)

    def test_identity_at_south_pole(self, rng):
        np_uv = jnp.array([0.3, -0.5 * PI])
        s_uv = jnp.asarray(_rand_uv(rng, 10))
        np.testing.assert_allclose(np.asarray(pano_rotate(np_uv, s_uv)),
                                   np.asarray(s_uv), atol=1e-6)

    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    def test_rotate_parity(self, rng):
        import torch
        np_uv = np.array([-0.3, 0.25], dtype=np.float32) * PI
        s_uv = _rand_uv(rng, 200) * 0.95
        ref = REF["pano_rotate"].pano_rotate(torch.tensor(np_uv), torch.tensor(s_uv).clone()).numpy()
        ours = np.asarray(pano_rotate(jnp.asarray(np_uv), jnp.asarray(s_uv)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    def test_rotate_image_parity(self, rng):
        import torch
        np_uv = np.array([0.3 * PI, -0.4 * PI], dtype=np.float32)
        im = rng.random((1, 3, 16, 32)).astype(np.float32)
        ref, _ = REF["pano_rotate"].pano_rotate_image(torch.tensor(im), torch.tensor(np_uv))
        ours, _ = pano_rotate_image(jnp.asarray(im), jnp.asarray(np_uv))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


class TestGridSample:
    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    @pytest.mark.parametrize("padding", ["border", "zeros"])
    def test_parity_with_torch(self, rng, padding):
        import torch
        import torch.nn.functional as F
        im = rng.random((2, 3, 9, 13)).astype(np.float32)
        grid = (rng.random((2, 5, 7, 2)).astype(np.float32) - 0.5) * 2.4  # incl. out-of-range
        ref = F.grid_sample(torch.tensor(im), torch.tensor(grid), mode="bilinear",
                            padding_mode=padding, align_corners=False).numpy()
        ours = np.asarray(grid_sample(jnp.asarray(im), jnp.asarray(grid), padding_mode=padding))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_identity_grid(self, rng):
        im = rng.random((1, 2, 8, 8)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        gx = (2 * xs + 1) / 8 - 1
        gy = (2 * ys + 1) / 8 - 1
        grid = np.stack([gx, gy], -1)[None].astype(np.float32)
        out = np.asarray(grid_sample(jnp.asarray(im), jnp.asarray(grid)))
        np.testing.assert_allclose(out, im, atol=1e-6)


class TestProjection:
    def test_tangent_roundtrip(self, rng):
        uv0 = jnp.array([0.3, -0.2 * PI])
        xy = jnp.asarray((rng.random((50, 2)).astype(np.float32) - 0.5))
        uv = tangent_xy_to_equirect_uv(xy, uv0)
        xy2 = equirect_uv_to_tangent_xy(uv, uv0)
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)

    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    def test_tangent_parity(self, rng):
        import torch
        uv0 = np.array([0.0, -0.3 * PI], dtype=np.float32)
        xy = (rng.random((64, 2)).astype(np.float32) - 0.5)
        ref = REF["tangent"].tangent_xy2equirectangular_uv(torch.tensor(xy), torch.tensor(uv0)).numpy()
        ours = np.asarray(tangent_xy_to_equirect_uv(jnp.asarray(xy), jnp.asarray(uv0)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestAxis:
    def test_ew2ns_involution(self, rng):
        for h in [4, 6, 10]:
            x = jnp.asarray(rng.random((2, h, 2 * h, 3)).astype(np.float32))
            y = ns2we(ew2ns(x))
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)

    @pytest.mark.skipif(REF is None, reason="reference unavailable")
    def test_ew2ns_parity(self, rng):
        import torch
        x = rng.random((2, 3, 6, 12)).astype(np.float32)  # b c h w
        ref = REF["axis"].ew2ns(torch.tensor(x)).numpy()
        ours = np.asarray(ew2ns(jnp.asarray(np.moveaxis(x, 1, -1))))
        np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, atol=0)
