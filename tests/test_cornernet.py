"""CornerNet tests: gaussian radius/targets, corner pairing decode,
train/test round trip on a tiny hourglass."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.cornernet import (
    gaussian_radius, draw_gaussians)


def test_gaussian_radius_monotone():
    r_small = float(gaussian_radius(jnp.asarray(8.0), jnp.asarray(8.0)))
    r_big = float(gaussian_radius(jnp.asarray(32.0), jnp.asarray(32.0)))
    assert 0 < r_small < r_big


def test_draw_gaussians_peak():
    hm = np.asarray(draw_gaussians(16, 16, jnp.asarray([5.0]),
                                   jnp.asarray([9.0]), jnp.asarray([2.0]),
                                   jnp.asarray([True])))
    assert hm[9, 5] == hm.max() and abs(hm[9, 5] - 1.0) < 1e-5
    assert not np.asarray(draw_gaussians(
        16, 16, jnp.asarray([5.0]), jnp.asarray([9.0]), jnp.asarray([2.0]),
        jnp.asarray([False]))).any()


def test_cornernet_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "CornerNet",
        "backbone": {"type": "HourglassNet", "num_stacks": 1, "depth": 2},
        "num_classes": 3, "corner_topk": 20,
    })
    B = 1
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray([[[8, 8, 40, 40], [16, 20, 60, 44]]], jnp.float32)
    gtl = jnp.asarray([[0, 2]], jnp.int32)
    gtv = jnp.ones((B, 2), bool)
    out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_heatmap", "loss_offset", "loss_pull", "loss_push"):
        assert np.isfinite(float(out[k])), k
    grads = jax.grad(lambda p: sum(det.apply(
        {**variables, "params": p}, imgs, shapes, gtb, gtl, gtv,
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
    # decoded boxes that survive must be well-formed (br > tl)
    m = np.asarray(res.mask)[0]
    b = np.asarray(res.boxes)[0][m]
    if len(b):
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()


def test_centripetalnet_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "CentripetalNet",
        "backbone": {"type": "HourglassNet", "num_stacks": 1, "depth": 2},
        "num_classes": 3, "corner_topk": 20,
    })
    B = 1
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray([[[8, 8, 40, 40]]], jnp.float32)
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       mutable=["batch_stats"])
    for k in ("loss_heatmap", "loss_offset", "loss_centripetal_shift"):
        assert np.isfinite(float(out[k])), k
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
