"""GFL tests: integral regression, distance coding, detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.gfl import (
    integral, distance2bbox, bbox2distance)


def test_integral_expectation():
    # delta at bin 5 on all four sides -> distance 5
    logits = np.full((2, 4 * 17), -20.0, np.float32)
    for s in range(4):
        logits[:, s * 17 + 5] = 20.0
    d = np.asarray(integral(jnp.asarray(logits), 16))
    np.testing.assert_allclose(d, 5.0, atol=1e-3)


def test_distance_bbox_roundtrip(rng):
    centers = jnp.asarray(rng.random((6, 2)).astype(np.float32) * 10 + 8)
    dist = jnp.asarray(rng.random((6, 4)).astype(np.float32) * 7)
    boxes = distance2bbox(centers, dist)
    back = bbox2distance(centers, boxes, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)


def test_gfl_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "GFL",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3,
        "reg_max": 8,
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
    for k in ("loss_cls", "loss_bbox", "loss_dfl"):
        assert np.isfinite(float(out[k])), k
    grads = jax.grad(lambda p: sum(det.apply(
        {**variables, "params": p}, imgs, shapes, gtb, gtl, gtv,
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)


def test_ld_distillation(rng):
    """Student GFL distilled from a random frozen teacher's distributions."""
    cfg = {
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3, "reg_max": 8}
    student = build(DETECTORS, {"type": "LDGFL", **cfg})
    teacher = build(DETECTORS, {"type": "GFL", **cfg})
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    sv = student.init(jax.random.PRNGKey(0), imgs)
    tv = teacher.init(jax.random.PRNGKey(7), imgs)

    # frozen teacher forward -> flattened reg logits
    def teacher_reg(imgs):
        cls_l, reg_l = teacher.apply(tv, imgs, train=False)
        return jnp.concatenate(
            [r.reshape(B, -1, 4 * (8 + 1)) for r in reg_l], 1)

    treg = jax.lax.stop_gradient(teacher_reg(imgs))
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = student.apply(sv, imgs, shapes, gtb,
                           jnp.zeros((B, 1), jnp.int32),
                           jnp.ones((B, 1), bool), treg,
                           method=student.forward_train_kd,
                           mutable=["batch_stats"])
    assert "loss_ld" in out
    assert all(np.isfinite(float(x)) for x in out.values())
    # distilling the student's own output must give (near-)zero LD loss
    sreg = jnp.concatenate(
        [r.reshape(B, -1, 4 * 9) for r in student.apply(
            sv, imgs, train=False)[1]], 1)
    out_self, _ = student.apply(sv, imgs, shapes, gtb,
                                jnp.zeros((B, 1), jnp.int32),
                                jnp.ones((B, 1), bool), sreg,
                                method=student.forward_train_kd,
                                mutable=["batch_stats"])
    assert float(out_self["loss_ld"]) < 1e-5
