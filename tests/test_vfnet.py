"""VFNet tests: star DCN offsets + detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.vfnet import (
    star_dcn_offset)


def test_star_offsets_land_on_box():
    # distances l=8, t=16, r=24, b=32 at stride 8: taps should sample at
    # (dy, dx) in {-2, 0, 4} x {-1, 0, 3} feature units
    d = jnp.asarray([[[8.0, 16.0, 24.0, 32.0]]])
    off = np.asarray(star_dcn_offset(d, 8.0))[0, 0]
    ys, xs = [-2.0, 0.0, 4.0], [-1.0, 0.0, 3.0]
    for i in range(3):
        for j in range(3):
            k = i * 3 + j
            # offset + regular tap position == the star point
            assert off[2 * k] + (i - 1) == ys[i]
            assert off[2 * k + 1] + (j - 1) == xs[j]


def test_vfnet_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "VFNet",
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
    for k in ("loss_cls", "loss_bbox", "loss_bbox_rf"):
        assert np.isfinite(float(out[k])), k
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
