"""Extra loss coverage: GHM-C, IoU loss, balanced L1, box conversions."""

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
