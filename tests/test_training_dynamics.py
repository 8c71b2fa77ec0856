"""Learning dynamics: the full train step reduces losses on a fixed batch
(overfit sanity — validates grads, optimizer, target assembly together)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-size/overfit tier (VERDICT r3 #8)


def test_detector_overfits_fixed_batch(rng):
    from tests.test_detector import tiny_detector
    from panoswintransformerobjectdetection_tpu.runtime import (
        create_train_state, make_train_step, make_optimizer)

    det = tiny_detector()
    B, H, W = 2, 64, 128
    imgs = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    batch = {
        "images": imgs,
        "img_shapes": jnp.full((B, 2), jnp.float32(64)).at[:, 1].set(128.0),
        "gt_boxes": jnp.asarray(np.tile(np.array(
            [[[10, 10, 50, 40], [60, 20, 110, 55]]], np.float32), (B, 1, 1))),
        "gt_labels": jnp.asarray(np.tile([[0, 2]], (B, 1))),
        "gt_valid": jnp.ones((B, 2), bool),
    }
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params0 = det.init(jax.random.PRNGKey(0), sample)["params"]
    tx = make_optimizer(params0, base_lr=3e-4, warmup_iters=5)
    state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)
    step = jax.jit(make_train_step(det))

    losses = []
    rngk = jax.random.PRNGKey(7)
    for i in range(40):
        state, metrics = step(state, batch, rngk)
        losses.append(float(metrics["loss"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.7, (first, last, losses[::8])
    # rpn localization specifically should improve
    assert float(metrics["loss_rpn_bbox"]) < 0.6
