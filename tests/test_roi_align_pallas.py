"""Fused Pallas RoIAlign crop kernel vs the XLA einsum pair (interpret
mode on CPU) — forward parity across chunk/pad/C-tile shapes, gradient
parity through the custom VJP, and the multilevel wrapper toggle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.roi_align_pallas import (
    fused_crop_per_image, _xla_crop, supports)
from panoswintransformerobjectdetection_tpu.ops import roi_align as ra


def _rand(rng, B, Hl, Wl, C, P, o=7):
    feat = jnp.asarray(rng.standard_normal((B, Hl, Wl, C)), jnp.float32)
    Wy = jnp.asarray(rng.standard_normal((B, P, o, Hl)), jnp.float32) * 0.1
    Wx = jnp.asarray(rng.standard_normal((B, P, o, Wl)), jnp.float32) * 0.1
    return feat, Wy, Wx


class TestFusedCrop:
    @pytest.mark.parametrize("shape", [
        (2, 24, 16, 256, 21, 8),   # pad path (21 % 8 != 0)
        (1, 32, 8, 128, 16, 16),   # single C-tile, exact chunks
        (3, 16, 16, 384, 5, 4),    # 3 C-tiles, P < chunk*2
    ])
    def test_forward_parity(self, rng, shape):
        B, Hl, Wl, C, P, chunk = shape
        feat, Wy, Wx = _rand(rng, B, Hl, Wl, C, P)
        ref = _xla_crop(feat, Wy, Wx)
        out = fused_crop_per_image(feat, Wy, Wx, chunk, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_grad_parity(self, rng):
        feat, Wy, Wx = _rand(rng, 1, 16, 8, 128, 9)

        def loss(fn):
            return lambda f, wy, wx: (fn(f, wy, wx) ** 2).sum()

        g1 = jax.grad(loss(lambda f, wy, wx: fused_crop_per_image(
            f, wy, wx, 4, True)), argnums=(0, 1, 2))(feat, Wy, Wx)
        g2 = jax.grad(loss(_xla_crop), argnums=(0, 1, 2))(feat, Wy, Wx)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-4)

    def test_supports_gate(self, rng):
        feat, Wy, Wx = _rand(rng, 1, 16, 8, 128, 4)
        assert supports(feat, Wy, Wx)
        feat100, Wy_, Wx_ = _rand(rng, 1, 16, 8, 100, 4)
        assert not supports(feat100, Wy_, Wx_)  # C not lane-aligned

    def test_multilevel_toggle_parity(self, rng):
        """multilevel_roi_align with the pallas crop forced on (interpret
        via the kernel's interpret arg is not reachable from the wrapper,
        so force the XLA fallback comparison through USE_PALLAS_CROP)."""
        B, P, C = 2, 12, 256
        feats = [jnp.asarray(rng.standard_normal((B, 64 // s, 128 // s, C)),
                             jnp.float32) for s in (1, 2, 4, 8)]
        rois = []
        for b in range(B):
            for _ in range(P):
                x1, y1 = rng.uniform(0, 100), rng.uniform(0, 40)
                w, h = rng.uniform(4, 60), rng.uniform(4, 30)
                rois.append([b, x1, y1, x1 + w, y1 + h])
        rois = jnp.asarray(np.asarray(rois, np.float32))
        try:
            ra.USE_PALLAS_CROP = False
            ref = ra.multilevel_roi_align(feats, rois, strides=(4, 8, 16, 32),
                                          per_image=P)
        finally:
            ra.USE_PALLAS_CROP = None
        # pallas path forced on; interpret mode engages automatically off-TPU
        try:
            ra.USE_PALLAS_CROP = True
            out = ra.multilevel_roi_align(feats, rois, strides=(4, 8, 16, 32),
                                          per_image=P)
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.slow  # interpret-mode windowed kernel, minutes on 1 CPU
class TestWindowedCrop:
    """Windowed (locality) Pallas crop vs the dense einsum path through
    `multilevel_roi_align` — forward parity, adaptive sampling, the
    oversized-roi `lax.cond` fallback, and gradient parity."""

    # C=128: in f32 the windowed kernel's VMEM budget check
    # (_windowed_supported) rejects C=256 (scratch would be ~10.9 MB), so
    # C=256 f32 fixtures would silently run BOTH sides down the dense path
    # and test nothing; each test asserts eligibility to prevent that rot.
    def _feats_rois(self, rng, B=2, P=10, C=128, extreme=False):
        feats = [jnp.asarray(rng.standard_normal((B, 128 // s, 256 // s, C)),
                             jnp.float32) for s in (1, 2, 4, 8)]
        assert ra._windowed_supported(
            [f.transpose(0, 2, 1, 3) for f in feats], 7)
        rois = []
        for b in range(B):
            for i in range(P):
                x1, y1 = rng.uniform(0, 600), rng.uniform(0, 300)
                w, h = rng.uniform(8, 400), rng.uniform(8, 200)
                if extreme and i == 0:
                    # ~26:1 aspect: x-span exceeds the 32px window on its
                    # area-routed level -> whole batch must fall back
                    x1, y1, w, h = 0.0, 100.0, 1020.0, 10.0
                rois.append([b, x1, y1, min(x1 + w, 1023), min(y1 + h, 511)])
        return feats, jnp.asarray(np.asarray(rois, np.float32))

    @pytest.mark.parametrize("sr", [2, 0])
    def test_forward_parity(self, rng, sr):
        feats, rois = self._feats_rois(rng)
        ref = ra.multilevel_roi_align(feats, rois, per_image=10,
                                      sampling_ratio=sr)
        try:
            ra.USE_PALLAS_CROP = True
            out = ra.multilevel_roi_align(feats, rois, per_image=10,
                                          sampling_ratio=sr)
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_oversized_roi_falls_back_exactly(self, rng):
        feats, rois = self._feats_rois(rng, extreme=True)
        ref = ra.multilevel_roi_align(feats, rois, per_image=10)
        try:
            ra.USE_PALLAS_CROP = True
            out = ra.multilevel_roi_align(feats, rois, per_image=10)
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_grad_parity(self, rng):
        feats, rois = self._feats_rois(rng, P=6)

        def loss(f0):
            out = ra.multilevel_roi_align([f0] + feats[1:], rois,
                                          per_image=6)
            return (out.astype(jnp.float32) ** 2).sum()

        g_ref = jax.grad(loss)(feats[0])
        try:
            ra.USE_PALLAS_CROP = True
            g = jax.grad(loss)(feats[0])
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-3, rtol=1e-4)


@pytest.mark.slow  # interpret-mode windowed kernel, minutes on 1 CPU
class TestPerRoiHybrid:
    """Per-RoI eligibility: oversized RoIs route through the K-bounded
    dense overflow pass (one-hot compaction) without forfeiting the
    windowed fast path for the rest; > K overflow per image falls back
    to the full dense branch.  Both must match the dense path exactly."""

    def _mixed_rois(self, rng, B, P, n_over_per_image):
        rois = []
        for b in range(B):
            for i in range(P):
                if i < n_over_per_image:
                    # ~8:1 aspect: x-span exceeds the window on its level
                    x1, y1 = rng.uniform(0, 200), rng.uniform(50, 300)
                    w, h = 640.0, 80.0
                else:
                    x1, y1 = rng.uniform(0, 600), rng.uniform(0, 300)
                    s = rng.uniform(16, 100)
                    w = h = s
                rois.append([b, x1, y1, min(x1 + w, 1023), min(y1 + h, 511)])
        return jnp.asarray(np.asarray(rois, np.float32))

    def _feats(self, rng, B, C=128):
        # C=128: f32 windowed-kernel VMEM eligibility (see TestWindowedCrop)
        feats = [jnp.asarray(rng.standard_normal((B, 128 // s, 256 // s, C)),
                             jnp.float32) for s in (1, 2, 4, 8)]
        assert ra._windowed_supported(
            [f.transpose(0, 2, 1, 3) for f in feats], 7)
        return feats

    def test_hybrid_overflow_pass_exact(self, rng):
        """A mix of fitting + oversized RoIs within the K budget."""
        B, P = 2, 12
        feats = self._feats(rng, B)
        rois = self._mixed_rois(rng, B, P, n_over_per_image=3)
        stats = ra.window_engage_stats(
            [(f.shape[1], f.shape[2]) for f in feats], np.asarray(rois),
            per_image=P)
        assert stats["branch"] == "windowed+K-dense"
        assert 0 < stats["max_over_per_image"] <= stats["overflow_budget"]
        ref = ra.multilevel_roi_align(feats, rois, per_image=P)
        try:
            ra.USE_PALLAS_CROP = True
            out = ra.multilevel_roi_align(feats, rois, per_image=P)
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_budget_exceeded_full_dense(self, rng):
        """More than K oversized RoIs in one image -> full dense branch,
        still exact."""
        B, P = 1, 80
        feats = self._feats(rng, B)
        rois = self._mixed_rois(rng, B, P, n_over_per_image=70)
        stats = ra.window_engage_stats(
            [(f.shape[1], f.shape[2]) for f in feats], np.asarray(rois),
            per_image=P)
        assert stats["branch"] == "full-dense"
        ref = ra.multilevel_roi_align(feats, rois, per_image=P)
        try:
            ra.USE_PALLAS_CROP = True
            out = ra.multilevel_roi_align(feats, rois, per_image=P)
        finally:
            ra.USE_PALLAS_CROP = None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
