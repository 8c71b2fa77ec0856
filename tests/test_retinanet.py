"""RetinaNet single-stage detector tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def tiny_retina():
    return build(DETECTORS, {
        "type": "RetinaNet",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 16, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 4,
    })


class TestRetinaNet:
    def test_forward_train(self, rng):
        det = tiny_retina()
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32), (B, 1, 1)))
        gtl = jnp.zeros((B, 1), jnp.int32)
        gtv = jnp.ones((B, 1), bool)
        out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                           method=det.forward_train, mutable=["batch_stats"])
        assert np.isfinite(float(out["loss_cls"]))
        assert np.isfinite(float(out["loss_bbox"]))
        assert float(out["loss_bbox"]) > 0

    def test_simple_test(self, rng):
        det = tiny_retina()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        res = det.apply(variables, imgs, jnp.full((1, 2), 64.0),
                        jnp.ones((1, 4), jnp.float32), method=det.simple_test)
        assert res.boxes.shape == (1, 100, 4)

    def test_grads(self, rng):
        det = tiny_retina()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((1, 2), 64.0)
        gtb = jnp.asarray(np.array([[[4, 4, 40, 40]]], np.float32))
        gtl = jnp.zeros((1, 1), jnp.int32)
        gtv = jnp.ones((1, 1), bool)

        def loss_fn(p):
            out, _ = det.apply({"params": p, "batch_stats": variables["batch_stats"]},
                               imgs, shapes, gtb, gtl, gtv,
                               method=det.forward_train, mutable=["batch_stats"])
            return out["loss_cls"] + out["loss_bbox"]

        g = jax.grad(loss_fn)(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))


def test_free_anchor_train(rng):
    import jax
    from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
    det = build(DETECTORS, {
        "type": "FreeAnchorRetinaNet",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3, "pre_anchor_topk": 16,
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
    assert set(out) == {"positive_bag_loss", "negative_bag_loss"}
    assert all(np.isfinite(float(x)) and float(x) > 0 for x in out.values())
    grads = jax.grad(lambda p: sum(det.apply(
        {**v, "params": p}, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
        jnp.ones((B, 1), bool), method=det.forward_train,
        mutable=["batch_stats"])[0].values()))(v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    # all-padded gts: positive term 0, still finite
    out2, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                        jnp.zeros((B, 1), bool), method=det.forward_train,
                        mutable=["batch_stats"])
    assert float(out2["positive_bag_loss"]) == 0.0
    assert np.isfinite(float(out2["negative_bag_loss"]))


def test_retina_sepbn_head(rng):
    """RetinaSepBNHead variant (reference `retina_sepbn_head.py`,
    configs/nas_fpn): shared convs, separate BN per pyramid level."""
    from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
    det = build(DETECTORS, {
        "type": "RetinaNet",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
        "head": {"type": "RetinaSepBNHead", "use_sepbn": True,
                 "stacked_convs": 2, "feat_channels": 32},
    })
    imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    hp = v["params"]["head_m"]
    # separate BN per level, shared convs
    assert "cls_bn0_l0" in hp and "cls_bn0_l4" in hp
    assert "cls_conv0" in hp and "cls_conv0_l1" not in hp
    assert "cls_bn0_l0" in v["batch_stats"]["head_m"]
    out, _ = det.apply(v, imgs, jnp.full((1, 2), 64.0),
                       jnp.asarray([[[4, 4, 40, 40.]]]),
                       jnp.zeros((1, 1), jnp.int32),
                       jnp.ones((1, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss_cls"]))
    res = det.apply(v, imgs, jnp.full((1, 2), 64.0),
                    jnp.ones((1, 4), jnp.float32), method=det.simple_test)
    assert res.boxes.shape[-1] == 4
