"""Basketball (latitude rescale) transform tests + torch reference parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.geometry.basketball import (
    correct_center, patch_latitudes, stb_adjacency)


class TestBasketball:
    def test_equator_patches_unchanged(self, rng):
        # patches at the equator have cos(v) ~ 1 -> near-identity
        img = rng.random((40, 80, 3)).astype(np.float32)
        out = np.asarray(correct_center(jnp.asarray(img), patch_size=8))
        rows = slice(16, 24)  # middle patch row (v ~ 0)
        np.testing.assert_allclose(out[rows], img[rows], atol=1e-5)

    def test_pole_patches_shrink(self, rng):
        img = np.ones((40, 80, 1), np.float32)
        out = np.asarray(correct_center(jnp.asarray(img), patch_size=8))
        # top patch row: cos(v) small -> lots of zero padding
        assert (out[0:8] == 0).mean() > 0.4
        assert (out[16:24] == 0).mean() < 0.1

    def test_latitudes(self):
        vs = patch_latitudes(40, 8)
        assert len(vs) == 5
        np.testing.assert_allclose(vs[2], 0.0, atol=1e-6)
        assert vs[0] < 0 < vs[-1]

    def test_adjacency_full_pano(self):
        side, top, bottom = stb_adjacency((400, 800), 20)
        assert side and top and bottom

    def test_adjacency_partial(self):
        side, top, bottom = stb_adjacency((100, 800), 20, ratio_v=(0.2, 0.45))
        assert not top and not bottom

    def test_parity_with_reference(self, rng):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from reference_loader import load_reference
        if load_reference() is None:
            pytest.skip("reference unavailable")
        import importlib.util
        import torch
        try:
            spec = importlib.util.spec_from_file_location(
                "ref_basketball",
                "/root/reference/lzx/lzx_augs/basketball_transform_torchcuda.py")
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception as e:
            pytest.skip(f"reference basketball unavailable: {e}")
        img = rng.random((3, 40, 80)).astype(np.float32)  # CHW
        ref, _ = mod.correct_center(torch.tensor(img), patch_size=8)
        ours = np.asarray(correct_center(
            jnp.asarray(np.moveaxis(img, 0, -1)), patch_size=8))
        np.testing.assert_allclose(np.moveaxis(ours, -1, 0), ref.numpy(), atol=1e-4)
