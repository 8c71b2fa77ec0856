"""Cascade RPN tests: anchor-aligned offsets, two-stage losses, proposals."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models.cascade_rpn import (
    CascadeRPNHead, cascade_rpn_loss, cascade_rpn_proposals, anchor_offsets)


def test_anchor_offsets_identity_for_matching_anchor():
    # a 3x3-cell-sized anchor centered on its cell gives zero offsets
    H = W = 4
    s = 8.0
    xs = (np.arange(W) + 0.5) * s
    ys = (np.arange(H) + 0.5) * s
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    ctr = np.stack([gx, gy], -1).reshape(-1, 2)
    anchors = np.concatenate([ctr - s, ctr + s], -1)  # w = h = 2*stride
    off = np.asarray(anchor_offsets(jnp.asarray(anchors, jnp.float32),
                                    s, H, W))
    np.testing.assert_allclose(off, 0.0, atol=1e-5)


def _run_head(rng):
    head = CascadeRPNHead(feat_channels=16)
    feats = tuple(
        jnp.asarray(rng.random((2, 16 // k, 16 // k, 16)).astype(np.float32))
        for k in (1, 2))
    v = head.init(jax.random.PRNGKey(0), feats, (8, 16))
    return head, v, feats


def test_cascade_rpn_loss_and_proposals(rng):
    head, v, feats = _run_head(rng)
    out = head.apply(v, feats, (8, 16))
    gtb = jnp.asarray(np.tile(np.array([[[8, 8, 72, 72]]], np.float32),
                              (2, 1, 1)))
    gtv = jnp.ones((2, 1), bool)
    ls = cascade_rpn_loss(out, gtb, gtv)
    assert set(ls) == {"loss_rpn_reg_s1", "loss_rpn_cls", "loss_rpn_reg_s2"}
    assert all(np.isfinite(float(x)) for x in ls.values())
    grads = jax.grad(lambda p: sum(cascade_rpn_loss(
        head.apply({"params": p}, feats, (8, 16)), gtb, gtv).values()))(
        v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    props = cascade_rpn_proposals(out, jnp.full((2, 2), 128.0),
                                  nms_pre=64, max_per_img=32)
    assert props.boxes.shape == (2, 32, 4)
    assert bool(props.mask.any())


def test_crpn_faster_rcnn_train_and_test(rng):
    from panoswintransformerobjectdetection_tpu.models import (
        DETECTORS, build)
    det = build(DETECTORS, {
        "type": "CRPNFasterRCNN",
        "backbone": {"type": "ResNet", "depth": 18,
                     "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": 3,
        "train_cfg": {
            "rpn": {},
            "rpn_proposal": {"nms_pre": 128, "max_per_img": 64,
                             "iou_threshold": 0.7},
            "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5,
                     "min_pos_iou": 0.5, "num_samples": 32,
                     "pos_fraction": 0.25}}})
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init({"params": jax.random.PRNGKey(0),
                  "sampler": jax.random.PRNGKey(1)}, imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       mutable=["batch_stats"],
                       rngs={"sampler": jax.random.PRNGKey(2)})
    for k in ("loss_rpn_reg_s1", "loss_rpn_cls", "loss_rpn_reg_s2",
              "loss_cls", "loss_bbox"):
        assert k in out and np.isfinite(float(out[k])), k
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
