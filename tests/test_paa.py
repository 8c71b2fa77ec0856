"""PAA tests: 2-component EM split + detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.paa import gmm2_split


def test_gmm2_split_bimodal():
    vals = jnp.asarray([0.1, 0.12, 0.09, 0.11, 2.0, 2.1, 1.9, 2.05])
    valid = jnp.ones(8, bool)
    pos = np.asarray(gmm2_split(vals, valid))
    assert pos[:4].all() and not pos[4:].any()


def test_gmm2_split_respects_mask():
    vals = jnp.asarray([0.1, 0.2, 5.0, 5.0])
    valid = jnp.asarray([True, True, False, False])
    pos = np.asarray(gmm2_split(vals, valid))
    assert not pos[2:].any()
    pos_empty = np.asarray(gmm2_split(vals, jnp.zeros(4, bool)))
    assert not pos_empty.any()


def test_paa_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "PAA",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(variables, imgs, shapes, gtb,
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox", "loss_iou"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss_bbox"]) > 0  # EM produced positives
    grads = jax.grad(lambda p: sum(det.apply(
        {**variables, "params": p}, imgs, shapes, gtb,
        jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
