"""FSAF tests: region masks, TBLR decode, online level selection routing."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.fsaf import (
    _region_mask, _decode_tblr)


def test_region_mask_shrink():
    gts = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
    eff = np.asarray(_region_mask(gts, jnp.asarray([True]), 8, 8, 8.0, 0.2))
    ign = np.asarray(_region_mask(gts, jnp.asarray([True]), 8, 8, 8.0, 0.5))
    assert eff.sum() < ign.sum()
    # effective region is centered at the gt center (24, 24) -> pixel (2..3)
    ys, xs = np.nonzero(eff[0])
    assert set(ys) <= {2, 3} and set(xs) <= {2, 3}
    assert not _region_mask(gts, jnp.asarray([False]), 8, 8, 8.0,
                            0.5).any()


def test_decode_tblr_roundtrip():
    # reg of exactly (1,1,1,1) in 4*stride units at stride 8 -> box of
    # side 64 centered on the pixel center
    reg = jnp.ones((2, 2, 4))
    b = np.asarray(_decode_tblr(reg, 8.0))
    np.testing.assert_allclose(b[0, 0], [4 - 32, 4 - 32, 4 + 32, 4 + 32])


def test_fsaf_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "FSAF",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 44, 44]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(variables, imgs, shapes, gtb,
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    assert all(np.isfinite(float(x)) for x in out.values())
    assert float(out["loss_bbox"]) > 0
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
