"""Extra loss coverage: GHM-C, IoU loss, balanced L1, box conversions."""

import jax
import numpy as np
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.core import losses
from panoswintransformerobjectdetection_tpu.core.bbox import (
    xyxy_to_tlwh, tlwh_to_xyxy, normalize01_xyxy, unnormalize01_xyxy)


def test_ghm_finite_and_positive(rng):
    logits = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 20))
    l = float(losses.ghm_c_loss(logits, labels, 4))
    assert np.isfinite(l) and l > 0


def test_iou_loss_perfect_zero():
    b = jnp.array([[0., 0., 10., 10.]])
    assert float(losses.iou_loss(b, b)) < 1e-5
    shifted = jnp.array([[5., 0., 15., 10.]])
    assert float(losses.iou_loss(shifted, b)) > 0.5


def test_balanced_l1_zero_at_match():
    b = jnp.array([1.0, -2.0])
    assert abs(float(losses.balanced_l1_loss(b, b))) < 1e-6
    assert float(losses.balanced_l1_loss(b + 2.0, b)) > 1.0


def test_box_conversions_roundtrip(rng):
    xyxy = jnp.asarray(rng.random((5, 4)).astype(np.float32))
    xyxy = xyxy.at[:, 2:].add(1.0)
    np.testing.assert_allclose(
        np.asarray(tlwh_to_xyxy(xyxy_to_tlwh(xyxy))), np.asarray(xyxy), atol=1e-6)
    n = normalize01_xyxy(xyxy, 100, 50)
    np.testing.assert_allclose(
        np.asarray(unnormalize01_xyxy(n, 100, 50)), np.asarray(xyxy), atol=1e-5)


class TestGFLLosses:
    def test_qfl_matches_torch_semantics(self, rng):
        import torch
        import torch.nn.functional as F
        from panoswintransformerobjectdetection_tpu.core.losses import (
            quality_focal_loss)
        N, C = 12, 5
        logits = rng.standard_normal((N, C)).astype(np.float32)
        labels = rng.integers(0, C + 1, N).astype(np.int32)   # C = bg
        scores = rng.random(N).astype(np.float32)
        ours = float(quality_focal_loss(jnp.asarray(logits),
                                        jnp.asarray(labels),
                                        jnp.asarray(scores), C,
                                        avg_factor=N))
        # reference formula (gfocal_loss.py:11) reimplemented in torch
        tp = torch.tensor(logits)
        sig = tp.sigmoid()
        loss = F.binary_cross_entropy_with_logits(
            tp, torch.zeros_like(tp), reduction="none") * sig.pow(2.0)
        pos = np.nonzero(labels < C)[0]
        for i in pos:
            c = labels[i]
            sf = abs(scores[i] - sig[i, c].item())
            loss[i, c] = F.binary_cross_entropy_with_logits(
                tp[i, c], torch.tensor(scores[i]),
                reduction="none") * sf ** 2.0
        want = loss.sum(1).sum().item() / N
        assert abs(ours - want) < 1e-4

    def test_dfl_zero_at_integer_peak(self):
        from panoswintransformerobjectdetection_tpu.core.losses import (
            distribution_focal_loss)
        # target exactly 3 with a near-delta distribution at 3 -> tiny loss
        logits = jnp.full((1, 8), -20.0).at[0, 3].set(20.0)
        small = float(distribution_focal_loss(logits, jnp.array([3.0])))
        spread = float(distribution_focal_loss(jnp.zeros((1, 8)),
                                               jnp.array([3.0])))
        assert small < 1e-3 < spread

    def test_varifocal_and_gaussian_finite(self, rng):
        from panoswintransformerobjectdetection_tpu.core.losses import (
            varifocal_loss, gaussian_focal_loss)
        logits = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))
        t = jnp.zeros((6, 4)).at[0, 1].set(0.7).at[2, 3].set(0.4)
        v = float(varifocal_loss(logits, t))
        hm = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        gt = jnp.zeros((2, 8, 8, 3)).at[0, 4, 4, 0].set(1.0)
        g = float(gaussian_focal_loss(jax.nn.sigmoid(hm), gt))
        assert np.isfinite(v) and np.isfinite(g) and v > 0 and g > 0


class TestPISA:
    def test_carl_weights_sum_to_num_pos(self, rng):
        from panoswintransformerobjectdetection_tpu.core.losses import (
            carl_weights)
        logits = jnp.asarray(rng.standard_normal((10, 5)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 6, 10).astype(np.int32))
        pos = (labels < 5).astype(jnp.float32)
        w = np.asarray(carl_weights(logits, labels, pos, 5))
        assert abs(w.sum() - float(pos.sum())) < 1e-4
        assert (w[np.asarray(pos) == 0] == 0).all()

    def test_isr_weights_rank_order(self):
        from panoswintransformerobjectdetection_tpu.core.losses import (
            isr_weights)
        ious = jnp.asarray([0.9, 0.5, 0.7, 0.3])
        pos = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        w = np.asarray(isr_weights(ious, pos))
        # higher IoU -> higher weight; padded slot zero
        assert w[0] > w[2] > w[1] and w[3] == 0
        assert abs(w.sum() - 3.0) < 1e-4
