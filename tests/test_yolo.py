"""YOLOv3 + Darknet tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.yolo import Darknet


def tiny_yolo():
    return build(DETECTORS, {
        "type": "YOLOV3",
        "backbone": {"type": "Darknet"},
        "num_classes": 4,
    })


def test_darknet_shapes(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = Darknet()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024]
    assert [o.shape[1] for o in outs] == [8, 4, 2]


def test_yolo_train_and_test(rng):
    det = tiny_yolo()
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array(
        [[[4, 4, 40, 40], [20, 30, 50, 60]]], np.float32), (B, 1, 1)))
    gtl = jnp.asarray(np.tile([[0, 2]], (B, 1)))
    gtv = jnp.ones((B, 2), bool)
    out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                       method=det.forward_train, mutable=["batch_stats"])
    for k, v in out.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(out["loss_obj"]) > 0
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)


def test_yolo_grads(rng):
    det = tiny_yolo()
    imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)

    def loss_fn(p):
        out, _ = det.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            imgs, jnp.full((1, 2), 64.0), jnp.asarray([[[4, 4, 40, 40.]]]),
            jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool),
            method=det.forward_train, mutable=["batch_stats"])
        return sum(out.values())

    g = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
