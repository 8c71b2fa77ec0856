"""SSD tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.ssd import ssd_anchors, SSDVGG


def test_vgg_six_levels(rng):
    x = jnp.asarray(rng.random((1, 300, 300, 3)).astype(np.float32))
    m = SSDVGG()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert len(outs) == 6
    assert outs[0].shape[-1] == 512 and outs[1].shape[-1] == 1024
    assert outs[0].shape[1] > outs[1].shape[1] > outs[2].shape[1]


def test_ssd_anchor_counts():
    sizes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    a = ssd_anchors(sizes)
    assert len(a) == 6
    assert a[0].shape == (38 * 38 * 4, 4)
    assert a[1].shape == (19 * 19 * 6, 4)
    w = a[0][:, 2] - a[0][:, 0]
    assert (w > 0).all()


def test_ssd_train_and_test(rng):
    det = build(DETECTORS, {"type": "SSD",
                            "backbone": {"type": "SSDVGG"},
                            "num_classes": 4, "input_size": 300})
    B = 1
    imgs = jnp.asarray(rng.random((B, 300, 300, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 300.0)
    gtb = jnp.asarray(np.array([[[30, 30, 160, 180], [200, 40, 290, 120]]],
                               np.float32))
    gtl = jnp.asarray([[0, 2]])
    gtv = jnp.ones((B, 2), bool)
    out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                       method=det.forward_train, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss_cls"]))
    assert np.isfinite(float(out["loss_bbox"]))
    assert float(out["loss_bbox"]) > 0
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 200, 4)
