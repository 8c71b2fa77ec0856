"""YOLACT tests: crop op, train losses (incl. mask + segm), test masks."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.yolact import crop_mask


def test_crop_mask():
    m = jnp.ones((8, 8))
    out = np.asarray(crop_mask(m, jnp.asarray([8.0, 8.0, 24.0, 24.0]), 4.0))
    # pixels with centers in [8, 24] at stride 4: indices 2..5
    assert out[3, 3] == 1 and out[0, 0] == 0 and out[6, 6] == 0
    assert out.sum() == 16


def test_yolact_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "YOLACT",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3, "mask_train_cap": 8,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    gtm = np.zeros((B, 1, 64, 64), np.float32)
    gtm[:, 0, 8:36, 8:36] = 1.0
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), jnp.asarray(gtm),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox", "loss_mask", "loss_segm"):
        assert np.isfinite(float(out[k])), k
        assert float(out[k]) > 0, k
    grads = jax.grad(lambda p: sum(det.apply(
        {**v, "params": p}, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
        jnp.ones((B, 1), bool), jnp.asarray(gtm),
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    dets, masks = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                            method=det.simple_test)
    assert dets.boxes.shape == (B, 100, 4)
    assert masks.shape[:2] == (B, 100) and masks.shape[2:] == (16, 16)
    assert ((np.asarray(masks) >= 0) & (np.asarray(masks) <= 1)).all()


class TestFastNMS:
    """`bbox_nms.py:96 fast_nms` semantics (YOLACT)."""

    def test_chain_suppression_differs_from_greedy(self):
        # A(.9) overlaps B(.8) overlaps C(.7); A-C disjoint.  Greedy keeps
        # A and C; Fast NMS lets the suppressed B still kill C -> only A.
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.nms import fast_nms
        boxes = jnp.array([[0., 0., 10., 10.],
                           [6., 0., 16., 10.],
                           [12., 0., 22., 10.]])
        scores = jnp.array([[.9], [.8], [.7]])
        det, _ = fast_nms(boxes, scores, iou_threshold=0.2, max_per_img=3,
                          score_thr=0.01)
        kept = np.asarray(det.mask)
        assert kept.sum() == 1
        np.testing.assert_allclose(np.asarray(det.boxes)[0],
                                   [0., 0., 10., 10.])

    def test_classes_independent_and_coeffs_ride(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.nms import fast_nms
        boxes = jnp.array([[0., 0., 10., 10.], [1., 0., 11., 10.]])
        # same boxes, different classes: no cross-class suppression
        scores = jnp.array([[.9, .0], [.0, .8]])
        coeffs = jnp.array([[1., 2.], [3., 4.]])
        det, cf = fast_nms(boxes, scores, iou_threshold=0.5, max_per_img=4,
                           score_thr=0.01, coeffs=coeffs)
        kept = np.asarray(det.mask)
        assert kept.sum() == 2
        labs = sorted(np.asarray(det.labels)[kept].tolist())
        assert labs == [0, 1]
        # coefficients follow their detection
        order = np.argsort(np.asarray(det.labels)[kept])
        got = np.asarray(cf)[kept][order]
        np.testing.assert_allclose(got, [[1., 2.], [3., 4.]])

    def test_score_thr_masks(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.nms import fast_nms
        boxes = jnp.array([[0., 0., 10., 10.], [20., 0., 30., 10.]])
        scores = jnp.array([[.9], [.01]])
        det, _ = fast_nms(boxes, scores, iou_threshold=0.5, max_per_img=2,
                          score_thr=0.05)
        assert int(np.asarray(det.mask).sum()) == 1
