"""ATSS tests: adaptive assigner + detector."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.core.assigner import atss_assign
from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def test_atss_assign_basic():
    # two levels of anchors on a line; gt centered on level-0 anchors 2..3
    a0 = np.stack([np.arange(8) * 8.0, np.zeros(8), np.arange(8) * 8.0 + 8,
                   np.full(8, 8.0)], -1)
    a1 = np.stack([np.arange(4) * 16.0, np.zeros(4), np.arange(4) * 16.0 + 16,
                   np.full(4, 16.0)], -1)
    anchors = jnp.asarray(np.concatenate([a0, a1]), jnp.float32)
    gts = jnp.asarray([[14.0, 0.0, 30.0, 8.0]])
    assigned = atss_assign(anchors, ((0, 8), (8, 4)), gts,
                           jnp.asarray([True]), topk=3)
    a = np.asarray(assigned)
    assert (a > 0).any()
    # positives must have centers inside the gt
    pos_idx = np.nonzero(a > 0)[0]
    centers = (np.asarray(anchors)[pos_idx, 0] + np.asarray(anchors)[pos_idx, 2]) / 2
    assert ((centers > 14) & (centers < 30)).all()


def test_atss_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "ATSS",
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
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32), (B, 1, 1)))
    gtl = jnp.zeros((B, 1), jnp.int32)
    gtv = jnp.ones((B, 1), bool)
    out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(out[k])), k
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
