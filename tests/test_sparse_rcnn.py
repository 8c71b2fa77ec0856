"""Sparse R-CNN tests: stage structure, Hungarian losses, NMS-free test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def test_sparse_rcnn_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "SparseRCNN",
        "backbone": {"type": "ResNet", "depth": 18,
                     "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 32, "num_outs": 4},
        "num_classes": 3, "num_proposals": 16, "num_stages": 2, "dim": 32,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       mutable=["batch_stats"])
    # per-stage aux losses + final
    assert "loss_cls" in out and "s0.loss_cls" in out
    assert all(np.isfinite(float(x)) for x in out.values())
    grads = jax.grad(lambda p: sum(det.apply(
        {**v, "params": p}, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
        jnp.ones((B, 1), bool), method=det.forward_train,
        mutable=["batch_stats"])[0].values()))(v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 16 * 3, 4) or res.boxes.shape[0] == B
    b = np.asarray(res.boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
