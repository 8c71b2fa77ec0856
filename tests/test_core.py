"""Detection-core tests: coder golden values, anchors, assigner, sampler,
losses, NMS (vs an independent numpy greedy), RoIAlign analytics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.core import (
    bbox_overlaps, delta_encode, delta_decode, AnchorGenerator,
    max_iou_assign, random_sample, losses,
)
from panoswintransformerobjectdetection_tpu.ops.nms import nms, batched_nms, multiclass_nms
from panoswintransformerobjectdetection_tpu.ops.roi_align import roi_align


class TestBBox:
    def test_delta_decode_golden(self):
        # golden from mmdet delta2bbox docstring (delta_xywh_bbox_coder.py:175)
        rois = jnp.array([[0., 0., 1., 1.], [0., 0., 1., 1.],
                          [0., 0., 1., 1.], [5., 5., 5., 5.]])
        deltas = jnp.array([[0., 0., 0., 0.], [1., 1., 1., 1.],
                            [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
        out = delta_decode(rois, deltas, max_shape=(32, 32))
        expect = np.array([[0.0000, 0.0000, 1.0000, 1.0000],
                           [0.1409, 0.1409, 2.8591, 2.8591],
                           [0.0000, 0.3161, 4.1945, 0.6839],
                           [5.0000, 5.0000, 5.0000, 5.0000]])
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)

    def test_encode_decode_roundtrip(self, rng):
        prop = rng.random((20, 4)).astype(np.float32) * 100
        prop[:, 2:] += prop[:, :2] + 5
        gt = rng.random((20, 4)).astype(np.float32) * 100
        gt[:, 2:] += gt[:, :2] + 5
        means, stds = (0.1, 0.1, 0.2, 0.2), (1.0, 0.5, 0.8, 1.2)
        d = delta_encode(jnp.asarray(prop), jnp.asarray(gt), means, stds)
        back = delta_decode(jnp.asarray(prop), d, means, stds, wh_ratio_clip=1e-6)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)

    def test_iou_known(self):
        a = jnp.array([[0., 0., 10., 10.]])
        b = jnp.array([[5., 5., 15., 15.], [0., 0., 10., 10.], [20., 20., 30., 30.]])
        iou = np.asarray(bbox_overlaps(a, b))[0]
        np.testing.assert_allclose(iou, [25 / 175, 1.0, 0.0], atol=1e-6)

    def test_iof(self):
        a = jnp.array([[0., 0., 10., 10.]])
        b = jnp.array([[0., 0., 5., 10.]])
        iof = np.asarray(bbox_overlaps(a, b, mode="iof"))[0, 0]
        np.testing.assert_allclose(iof, 0.5, atol=1e-6)


class TestAnchors:
    def test_rpn_anchor_shapes(self):
        gen = AnchorGenerator(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0], scales=[8])
        sizes = [(16, 32), (8, 16), (4, 8), (2, 4), (1, 2)]
        anchors = gen.grid_anchors(sizes)
        assert len(anchors) == 5
        assert anchors[0].shape == (16 * 32 * 3, 4)
        # ratio 1 anchor at stride 4: 32x32 box centered at (0, 0)
        a = anchors[0][1]
        np.testing.assert_allclose(a, [-16, -16, 16, 16], atol=1e-5)
        # ratio 0.5 => wider than tall, w/h = sqrt(2)/sqrt(0.5) = 2
        a05 = anchors[0][0]
        w = a05[2] - a05[0]
        h = a05[3] - a05[1]
        np.testing.assert_allclose(w / h, 2.0, atol=1e-4)
        np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-4)
        # second grid cell shifts by stride in x
        np.testing.assert_allclose(anchors[0][3 + 1] - anchors[0][1],
                                   [4, 0, 4, 0], atol=1e-5)

    def test_valid_flags(self):
        gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
        flags = gen.valid_flags([(4, 4)], (9, 16))
        f = flags[0].reshape(4, 4)
        assert f[:3].all() and not f[3].any()


class TestAssigner:
    def test_basic_assignment(self):
        # anchors: 3; gts: 2
        ious = jnp.array([
            [0.8, 0.2, 0.0],
            [0.1, 0.5, 0.25],
        ])
        gt_valid = jnp.array([True, True])
        assigned, mo = max_iou_assign(ious, gt_valid, pos_iou_thr=0.7,
                                      neg_iou_thr=0.3, min_pos_iou=0.3)
        a = np.asarray(assigned)
        assert a[0] == 1            # iou 0.8 >= 0.7 -> gt 1
        assert a[1] == 2            # low-quality: best anchor of gt 2 (0.5 >= 0.3)
        assert a[2] == 0            # 0.25 < 0.3 -> negative

    def test_padded_gts_ignored(self):
        ious = jnp.array([
            [0.9, 0.9, 0.9],
            [0.95, 0.95, 0.95],
        ])
        gt_valid = jnp.array([True, False])
        assigned, _ = max_iou_assign(ious, gt_valid, 0.7, 0.3, 0.3)
        assert (np.asarray(assigned) == 1).all()

    def test_no_low_quality(self):
        ious = jnp.array([[0.5, 0.1]])
        assigned, _ = max_iou_assign(ious, jnp.array([True]), 0.7, 0.3, 0.3,
                                     match_low_quality=False)
        assert np.asarray(assigned)[0] == -1   # 0.3 <= 0.5 < 0.7: neither pos nor neg
        assert np.asarray(assigned)[1] == 0


class TestSampler:
    def test_counts(self):
        N = 1000
        assigned = jnp.asarray(
            np.concatenate([np.ones(300, np.int32), np.zeros(700, np.int32)]))
        r = random_sample(jax.random.PRNGKey(0), assigned, num=256, pos_fraction=0.5)
        n_pos = int(r.pos_mask.sum())
        n_neg = int(r.neg_mask.sum())
        assert n_pos == 128          # 300 available, capped at 128
        assert n_neg == 128          # fills to 256
        assert (np.asarray(assigned)[np.asarray(r.pos_inds)][np.asarray(r.pos_mask)] > 0).all()
        assert (np.asarray(assigned)[np.asarray(r.neg_inds)][np.asarray(r.neg_mask)] == 0).all()

    def test_few_positives(self):
        assigned = jnp.asarray(np.concatenate([np.ones(5, np.int32) * 2,
                                               np.zeros(995, np.int32)]))
        r = random_sample(jax.random.PRNGKey(1), assigned, num=256, pos_fraction=0.25)
        assert int(r.pos_mask.sum()) == 5
        assert int(r.neg_mask.sum()) == 251


def np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if not sup[j] and j != i:
                xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(a + b - inter, 1e-6) > thr:
                    sup[j] = True
    return keep


class TestNMS:
    def test_vs_numpy_greedy(self, rng):
        N = 100
        boxes = rng.random((N, 4)).astype(np.float32) * 50
        boxes[:, 2:] = boxes[:, :2] + 5 + boxes[:, 2:] * 0.5
        scores = rng.random(N).astype(np.float32)
        ref = np_greedy_nms(boxes, scores, 0.5)
        r = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=N)
        got = np.asarray(r.idx)[np.asarray(r.mask)]
        assert list(got) == ref

    def test_batched_separates_classes(self):
        boxes = jnp.array([[0., 0., 10., 10.], [0., 0., 10., 10.]])
        scores = jnp.array([0.9, 0.8])
        idxs = jnp.array([0, 1])
        r = batched_nms(boxes, scores, idxs, 0.5, 2)
        assert int(r.mask.sum()) == 2    # identical boxes, different classes survive

    def test_multiclass(self, rng):
        N, C = 50, 3
        boxes = rng.random((N, 4)).astype(np.float32) * 40
        boxes[:, 2:] = boxes[:, :2] + 5
        scores = rng.random((N, C + 1)).astype(np.float32)
        r = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                           score_thr=0.5, iou_threshold=0.5, max_per_img=20)
        m = np.asarray(r.mask)
        assert m.sum() > 0
        assert (np.asarray(r.scores)[m] > 0.5).all()
        assert set(np.asarray(r.labels)[m]).issubset({0, 1, 2})


class TestRoIAlign:
    def test_constant_map(self):
        feats = jnp.ones((2, 16, 16, 3)) * 7.0
        rois = jnp.array([[0., 2., 2., 10., 10.], [1., 0., 0., 16., 16.]])
        out = roi_align(feats, rois, out_size=7, spatial_scale=1.0)
        assert out.shape == (2, 7, 7, 3)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)

    def test_linear_ramp(self):
        # f(x, y) = x: each output bin = x coordinate of its center (aligned)
        H = W = 32
        xs = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
        feats = xs[None, ..., None]
        rois = jnp.array([[0., 4., 4., 18., 18.]])
        out = np.asarray(roi_align(feats, rois, out_size=7, spatial_scale=1.0))[0, :, :, 0]
        bin_w = 14.0 / 7
        centers = 4 - 0.5 + bin_w * (np.arange(7) + 0.5)
        np.testing.assert_allclose(out[3], centers, atol=1e-4)

    def test_batch_routing(self):
        feats = jnp.stack([jnp.zeros((8, 8, 1)), jnp.ones((8, 8, 1))])
        rois = jnp.array([[1., 1., 1., 7., 7.]])
        out = roi_align(feats, rois, out_size=2)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_grad(self):
        feats = jnp.ones((1, 8, 8, 2))
        rois = jnp.array([[0., 1., 1., 6., 6.]])
        g = jax.grad(lambda f: roi_align(f, rois, out_size=2).sum())(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_multilevel_wide_map_transpose_path(self):
        """Wide (W > H) pyramids take the transposed w-first fast path;
        it must agree with per-level roi_align routing exactly."""
        from panoswintransformerobjectdetection_tpu.ops.roi_align import (
            multilevel_roi_align)
        rng = np.random.default_rng(0)
        strides = (4, 8, 16, 32)
        H, W = 64, 128  # 2:1 pano aspect -> triggers the transpose
        feats = [jnp.asarray(rng.standard_normal(
            (2, H // s * 4, W // s * 4, 3)).astype(np.float32))
            for s in strides]
        # rois spanning all pyramid levels (small...large)
        sizes = np.array([20, 50, 100, 250, 400], np.float32)
        rois_np = []
        for b in range(2):
            for s in sizes:
                x1 = rng.uniform(0, 4 * W - s * 0.5)
                y1 = rng.uniform(0, 4 * H - s * 0.5)
                rois_np.append([b, x1, y1, x1 + s, y1 + s])
        rois = jnp.asarray(np.array(rois_np, np.float32))
        out = multilevel_roi_align(feats, rois, strides=strides)
        # independent routing: lvl = clamp(floor(log2(sqrt(area)/56)))
        scale = np.sqrt((rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2]))
        lvl = np.clip(np.floor(np.log2(np.asarray(scale) / 56 + 1e-6)),
                      0, 3).astype(int)
        for i in range(rois.shape[0]):
            ref = roi_align(feats[lvl[i]], rois[i:i + 1],
                            spatial_scale=1.0 / strides[lvl[i]])
            np.testing.assert_allclose(np.asarray(out[i]),
                                       np.asarray(ref[0]), atol=2e-4)
        # per-image path must agree too (block-ordered rois, 5 per image)
        out_pi = multilevel_roi_align(feats, rois, strides=strides,
                                      per_image=5)
        np.testing.assert_allclose(np.asarray(out_pi), np.asarray(out),
                                   atol=2e-4)


class TestLosses:
    def test_ce_matches_manual(self, rng):
        logits = jnp.asarray(rng.normal(size=(10, 5)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, 10))
        l = float(losses.cross_entropy(logits, labels))
        p = jax.nn.log_softmax(logits)
        manual = -np.asarray(p)[np.arange(10), np.asarray(labels)].mean()
        np.testing.assert_allclose(l, manual, rtol=1e-5)

    def test_smooth_l1(self):
        pred = jnp.array([0.0, 2.0])
        tgt = jnp.array([0.5, 0.0])
        l = float(losses.smooth_l1_loss(pred, tgt, beta=1.0))
        np.testing.assert_allclose(l, (0.5 * 0.25 + 1.5) / 2, rtol=1e-6)

    def test_giou_identical_boxes(self):
        b = jnp.array([[0., 0., 10., 10.]])
        assert float(losses.giou_loss(b, b)) < 1e-5

    def test_focal_reduces_easy(self):
        logits = jnp.array([[10.0], [0.0]])
        labels = jnp.array([0, 0])
        l_easy = float(losses.sigmoid_focal_loss(logits[:1], labels[:1], 1))
        l_hard = float(losses.sigmoid_focal_loss(logits[1:], labels[1:], 1))
        assert l_easy < l_hard


class TestCornerPool:
    def test_directions(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.corner_pool import (
            corner_pool, tl_pool)
        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
        top = np.asarray(corner_pool(x, "top"))[0, :, :, 0]
        # top pooling: every row = max over itself and rows below
        np.testing.assert_array_equal(top[0], [8, 9, 10, 11])
        np.testing.assert_array_equal(top[2], [8, 9, 10, 11])
        left = np.asarray(corner_pool(x, "left"))[0, :, :, 0]
        np.testing.assert_array_equal(left[0], [3, 3, 3, 3])
        right = np.asarray(corner_pool(x, "right"))[0, 0, :, 0]
        np.testing.assert_array_equal(right, [0, 1, 2, 3])
        assert np.asarray(tl_pool(x)).shape == (1, 3, 4, 1)


class TestDeformConv:
    def test_zero_offsets_match_regular_conv(self, rng):
        import jax
        from panoswintransformerobjectdetection_tpu.ops.deform_conv import (
            deform_conv2d)
        B, H, W, C, Co = 1, 8, 8, 3, 5
        x = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(9, C, Co)).astype(np.float32))
        offsets = jnp.zeros((B, H, W, 18))
        out = deform_conv2d(x, offsets, w)
        # regular conv with the same taps (zero padding)
        wconv = w.reshape(3, 3, C, Co)
        ref = jax.lax.conv_general_dilated(
            x, wconv, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_offset_shifts_sampling(self, rng):
        from panoswintransformerobjectdetection_tpu.ops.deform_conv import (
            deform_conv2d)
        B, H, W, C = 1, 6, 6, 1
        x = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
        # single-tap kernel (1x1), offset (dy=0, dx=1) -> output = x shifted
        w = jnp.ones((1, 1, 1))
        offsets = jnp.zeros((B, H, W, 2)).at[..., 1].set(1.0)
        out = np.asarray(deform_conv2d(x, offsets, w, kernel_size=1))
        np.testing.assert_allclose(out[0, :, :-1, 0],
                                   np.asarray(x)[0, :, 1:, 0], atol=1e-5)

    def test_dcn_module_initially_regular(self, rng):
        import jax
        from panoswintransformerobjectdetection_tpu.ops.deform_conv import DCN
        x = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
        m = DCN(features=6)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 8, 8, 6)
        assert np.isfinite(np.asarray(out)).all()
        # zero-init offset conv -> modulation sigmoid(0)=0.5, offsets 0:
        # equals 0.5 * regular conv
        w = v["params"]["kernel"].reshape(3, 3, 4, 6)
        ref = 0.5 * (jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + v["params"]["bias"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestCarafeAndPointSample:
    def test_carafe_uniform_kernels_average(self, rng):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.carafe import carafe
        x = jnp.asarray(rng.random((1, 4, 4, 2)).astype(np.float32))
        kernels = jnp.zeros((1, 8, 8, 25))   # softmax(0) = uniform average
        out = carafe(x, kernels, up=2, k=5)
        assert out.shape == (1, 8, 8, 2)
        # uniform kernel = local 5x5 mean of (zero-padded) source
        assert np.isfinite(np.asarray(out)).all()
        assert abs(float(out[0, 4, 4, 0]) -
                   float(np.asarray(x)[0, :, :, 0][0:5, 0:5].mean())) < 0.5

    def test_carafe_pack_shapes(self, rng):
        import jax
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.carafe import CARAFEPack
        x = jnp.asarray(rng.random((1, 4, 6, 8)).astype(np.float32))
        m = CARAFEPack()
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 8, 12, 8)

    def test_point_sample_center(self, rng):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops import point_sample
        feats = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        pts = jnp.asarray([[[0.5, 0.5]]])
        out = float(point_sample(feats, pts)[0, 0, 0])
        assert abs(out - np.asarray(feats)[0].mean()) < 1.0


class TestSAC:
    def test_initially_matches_single_conv_blend(self, rng):
        import jax
        from panoswintransformerobjectdetection_tpu.ops.deform_conv import SAC
        x = jnp.asarray(rng.random((1, 12, 12, 4)).astype(np.float32))
        m = SAC(features=6)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 12, 12, 6)
        # delta zero-init + switch 0.5: out = 0.5*(conv_d1 + conv_d3)
        w = v["params"]["kernel"]
        dn = ("NHWC", "HWIO", "NHWC")
        y1 = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                          dimension_numbers=dn)
        y3 = jax.lax.conv_general_dilated(x, w, (1, 1), [(3, 3), (3, 3)],
                                          rhs_dilation=(3, 3),
                                          dimension_numbers=dn)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(0.5 * (y1 + y3)), atol=1e-4)


class TestPointAssign:
    def test_levels_and_nearest(self):
        from panoswintransformerobjectdetection_tpu.core.assigner import (
            point_assign)
        # points: level-3 grid (stride 8) then level-4 (stride 16)
        p8 = np.stack(np.meshgrid(np.arange(4) * 8 + 4,
                                  np.arange(4) * 8 + 4), -1).reshape(-1, 2)
        p16 = np.stack(np.meshgrid(np.arange(2) * 16 + 8,
                                   np.arange(2) * 16 + 8), -1).reshape(-1, 2)
        pts = jnp.asarray(np.concatenate([p8, p16]), jnp.float32)
        strides = jnp.asarray([8.0] * 16 + [16.0] * 4)
        # gt sqrt(wh)=32 -> log2(32/4)=3 -> stride-8 level; center chosen
        # off-grid so the 3 nearest points are tie-free
        gts = jnp.asarray([[1.5, -1.0, 33.5, 31.0]])
        a = np.asarray(point_assign(pts, strides, gts,
                                    jnp.asarray([True]), pos_num=3))
        assert (a[:16] > 0).sum() == 3 and (a[16:] == 0).all()
        # the claimed points are the 3 nearest to the gt center (17.5, 15)
        d = np.linalg.norm(np.asarray(pts[:16]) - np.array([17.5, 15.0]),
                           axis=-1)
        assert set(np.nonzero(a[:16])[0]) == set(np.argsort(d)[:3])

    def test_contested_point_goes_to_nearest_gt(self):
        from panoswintransformerobjectdetection_tpu.core.assigner import (
            point_assign)
        pts = jnp.asarray([[10.0, 10.0]])
        strides = jnp.asarray([8.0])
        gts = jnp.asarray([[0.0, 0.0, 32.0, 32.0],      # center (16,16)
                           [-6.0, -6.0, 26.0, 26.0]])   # center (10,10)
        a = np.asarray(point_assign(pts, strides, gts,
                                    jnp.asarray([True, True]), pos_num=1))
        assert a[0] == 2


class TestReferenceTransformApi:
    """`mmdet/core/bbox/transforms.py` named API (jnp rewrites)."""

    def test_bbox_flip_directions(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import bbox_flip
        b = jnp.array([[10., 20., 30., 40.]])
        hshape = (100, 200)
        h = bbox_flip(b, hshape, "horizontal")
        np.testing.assert_allclose(np.asarray(h), [[170., 20., 190., 40.]])
        v = bbox_flip(b, hshape, "vertical")
        np.testing.assert_allclose(np.asarray(v), [[10., 60., 30., 80.]])
        d = bbox_flip(b, hshape, "diagonal")
        np.testing.assert_allclose(np.asarray(d), [[170., 60., 190., 80.]])
        # 4k layout
        b8 = jnp.concatenate([b, b], axis=-1)
        h8 = bbox_flip(b8, hshape, "horizontal")
        np.testing.assert_allclose(np.asarray(h8)[:, :4], np.asarray(h))
        np.testing.assert_allclose(np.asarray(h8)[:, 4:], np.asarray(h))

    def test_bbox_mapping_round_trip(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            bbox_mapping, bbox_mapping_back)
        b = jnp.array([[10., 20., 30., 40.]])
        sf = jnp.array([2., 2., 2., 2.])
        fwd = bbox_mapping(b, (200, 400), sf, True, "horizontal")
        back = bbox_mapping_back(fwd, (200, 400), sf, True, "horizontal")
        np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-5)

    def test_bbox2roi_roi2bbox(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import bbox2roi, roi2bbox
        per_img = [jnp.array([[1., 2., 3., 4.]]),
                   jnp.array([[5., 6., 7., 8.], [9., 10., 11., 12.]])]
        rois = bbox2roi(per_img)
        assert rois.shape == (3, 5)
        np.testing.assert_allclose(np.asarray(rois[:, 0]), [0., 1., 1.])
        back = roi2bbox(rois)
        np.testing.assert_allclose(back[1], np.asarray(per_img[1]))

    def test_bbox2result_partition(self):
        from panoswintransformerobjectdetection_tpu.core import bbox2result
        boxes = np.array([[0, 0, 1, 1, .9], [2, 2, 3, 3, .8]], np.float32)
        out = bbox2result(boxes, np.array([1, 0]), 3)
        assert len(out) == 3 and out[2].shape == (0, 5)
        np.testing.assert_allclose(out[0], boxes[1:])
        out0 = bbox2result(np.zeros((0, 5)), np.zeros((0,)), 2)
        assert all(o.shape == (0, 5) for o in out0)

    def test_distance2bbox_round_trip_and_clamp(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            distance2bbox, bbox2distance)
        pts = jnp.array([[50., 50.], [10., 90.]])
        box = jnp.array([[40., 30., 80., 70.], [0., 80., 30., 100.]])
        d = bbox2distance(pts, box)
        np.testing.assert_allclose(np.asarray(distance2bbox(pts, d)),
                                   np.asarray(box), atol=1e-5)
        clamped = distance2bbox(pts, d + 1000.0, max_shape=(100, 100))
        assert float(clamped.max()) <= 100.0 and float(clamped.min()) >= 0.0

    def test_bbox_rescale_and_cxcywh(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            bbox_rescale, bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh)
        b = jnp.array([[10., 10., 30., 50.]])
        r = bbox_rescale(b, 2.0)
        np.testing.assert_allclose(np.asarray(r), [[0., -10., 40., 70.]])
        roi = jnp.array([[3., 10., 10., 30., 50.]])
        r5 = bbox_rescale(roi, 2.0)
        assert float(r5[0, 0]) == 3.0
        cw = bbox_xyxy_to_cxcywh(b)
        np.testing.assert_allclose(np.asarray(cw), [[20., 30., 20., 40.]])
        np.testing.assert_allclose(np.asarray(bbox_cxcywh_to_xyxy(cw)),
                                   np.asarray(b), atol=1e-6)

    def test_multi_apply(self):
        from panoswintransformerobjectdetection_tpu.core import multi_apply

        def f(a, b, k=1):
            return a + b * k, a - b

        sums, diffs = multi_apply(f, [1, 2], [10, 20], k=2)
        assert sums == [21, 42] and diffs == [-9, -18]


class TestMergeAugs:
    """`mmdet/core/post_processing/merge_augs.py` named API."""

    def _metas(self):
        return [{"img_shape": (100, 200), "scale_factor": 1.0,
                 "flip": False},
                {"img_shape": (100, 200), "scale_factor": 1.0,
                 "flip": True, "flip_direction": "horizontal"}]

    def test_merge_aug_bboxes_mean_undoes_flip(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            merge_aug_bboxes, bbox_flip)
        b = jnp.array([[10., 20., 30., 40.]])
        flipped = bbox_flip(b, (100, 200), "horizontal")
        boxes, scores = merge_aug_bboxes(
            [b, flipped], [jnp.array([[.8]]), jnp.array([[.6]])],
            self._metas())
        np.testing.assert_allclose(np.asarray(boxes), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores), [[.7]], atol=1e-6)

    def test_merge_aug_scores_numpy(self):
        from panoswintransformerobjectdetection_tpu.core import merge_aug_scores
        out = merge_aug_scores([np.array([1., 3.]), np.array([3., 5.])])
        np.testing.assert_allclose(out, [2., 4.])

    def test_merge_aug_proposals_nms(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            merge_aug_proposals, bbox_flip)
        p1 = jnp.array([[10., 20., 30., 40., .9]])
        fb = bbox_flip(p1[:, :4], (100, 200), "horizontal")
        p2 = jnp.concatenate([fb, jnp.array([[.8]])], axis=1)
        merged, mask = merge_aug_proposals(
            [p1, p2], self._metas(),
            dict(nms=dict(iou_threshold=0.5), max_per_img=10))
        kept = np.asarray(mask)
        assert kept.sum() == 1          # duplicates collapse after un-flip
        np.testing.assert_allclose(np.asarray(merged)[0, :4],
                                   [10., 20., 30., 40.], atol=1e-4)

    def test_merge_aug_masks_unflips(self):
        from panoswintransformerobjectdetection_tpu.core import merge_aug_masks
        m = np.zeros((1, 1, 2, 4), np.float32)
        m[..., 0] = 1.0                        # left column hot
        mf = m[..., ::-1]                      # horizontally flipped aug
        out = merge_aug_masks([m, mf], self._metas())
        np.testing.assert_allclose(out, m)     # un-flip makes them agree
        w = merge_aug_masks([m, mf], self._metas(), weights=[3.0, 1.0])
        np.testing.assert_allclose(w, m)


class TestAnchorApi:
    """`mmdet/core/anchor` named API (PointGenerator, YOLO anchors, utils)."""

    def test_point_generator(self):
        from panoswintransformerobjectdetection_tpu.core import PointGenerator
        pg = PointGenerator()
        pts = pg.grid_points((2, 3), stride=8)
        assert pts.shape == (6, 3)
        np.testing.assert_allclose(pts[0], [0., 0., 8.])
        np.testing.assert_allclose(pts[4], [8., 8., 8.])   # row-major, x fast
        flags = pg.valid_flags((2, 3), (1, 2))
        assert flags.tolist() == [True, True, False, False, False, False]

    def test_yolo_anchor_generator(self):
        from panoswintransformerobjectdetection_tpu.core import (
            build_anchor_generator)
        gen = build_anchor_generator(dict(
            type="YOLOAnchorGenerator", strides=[32, 16],
            base_sizes=[[(116, 90), (156, 198)], [(30, 61), (62, 45)]]))
        assert gen.num_levels == 2 and gen.num_base_anchors == [2, 2]
        a = gen.grid_anchors([(2, 2), (4, 4)])
        assert a[0].shape == (8, 4) and a[1].shape == (32, 4)
        # first anchor: centered at stride/2 = 16 with size (116, 90)
        np.testing.assert_allclose(a[0][0], [16 - 58, 16 - 45, 16 + 58, 16 + 45])
        # responsibility: gt center (40, 40) -> cell (1,1) at stride 32
        flags = gen.responsible_flags([(2, 2), (4, 4)],
                                      np.array([[30., 30., 50., 50.]]))
        lvl0 = flags[0].reshape(2, 2, 2)
        assert lvl0[1, 1].all() and lvl0.sum() == 2
        lvl1 = flags[1].reshape(4, 4, 2)   # stride 16 -> cell (2, 2)
        assert lvl1[2, 2].all() and lvl1.sum() == 2

    def test_anchor_inside_flags_and_images_to_levels(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import (
            anchor_inside_flags, images_to_levels, calc_region)
        anchors = jnp.array([[-1., 0., 5., 5.], [0., 0., 5., 5.],
                             [0., 0., 21., 5.]])
        vf = jnp.array([True, True, True])
        inside = anchor_inside_flags(anchors, vf, (10, 20), 0)
        assert np.asarray(inside).tolist() == [False, True, False]
        inside2 = anchor_inside_flags(anchors, vf, (10, 20), 2)
        assert np.asarray(inside2).tolist() == [True, True, True]
        lv = images_to_levels([np.arange(6), np.arange(6) + 10], [4, 2])
        assert np.asarray(lv[0]).shape == (2, 4)
        np.testing.assert_allclose(np.asarray(lv[1][1]), [14, 15])
        x1, y1, x2, y2 = calc_region(jnp.array([0., 0., 10., 10.]), 0.2,
                                     featmap_size=(8, 8))
        assert (int(x1), int(y1), int(x2), int(y2)) == (2, 2, 8, 8)


class TestEvaluationApi:
    """`mmdet/core/evaluation` named helpers."""

    def test_average_precision_area_and_11points(self):
        from panoswintransformerobjectdetection_tpu.core import average_precision
        rec = np.array([0.25, 0.5, 0.75, 1.0])
        pre = np.array([1.0, 1.0, 1.0, 1.0])
        assert abs(average_precision(rec, pre, "area") - 1.0) < 1e-6
        assert abs(average_precision(rec, pre, "11points") - 1.0) < 1e-6
        # recall never reaches 1; thr=0.9 from np.arange drifts to
        # 0.9000000000000001 (same arithmetic as the reference mean_ap.py),
        # so 9 of 11 thresholds are covered
        rec_p = np.array([0.25, 0.5, 0.75, 0.9])
        assert abs(average_precision(rec_p, pre, "11points") - (9 / 11)) < 1e-6
        pre2 = np.array([1.0, 0.5, 0.5, 0.25])
        ap = average_precision(rec, pre2, "area")
        assert 0.25 < ap < 1.0

    def test_eval_map_named(self):
        from panoswintransformerobjectdetection_tpu.core import eval_map
        gts = [{"bboxes": np.array([[0., 0., 10., 10.]], np.float32),
                "labels": np.array([0])}]
        det = [{"boxes": np.array([[0., 0., 10., 10.]], np.float32),
                "scores": np.array([0.9], np.float32),
                "labels": np.array([0])}]
        m, _ = eval_map(det, gts, num_classes=1)
        assert m > 0.99

    def test_print_and_plot_helpers(self, tmp_path):
        from panoswintransformerobjectdetection_tpu.core import (
            print_map_summary, print_recall_summary, plot_num_recall,
            plot_iou_recall)
        t = print_map_summary(0.5, [dict(ap=0.5, num_gts=3, num_dets=7,
                                         **{"class": "car"})])
        assert "car" in t and "0.500" in t
        t2 = print_recall_summary(np.array([[0.4, 0.3], [0.6, 0.5]]),
                                  [100, 300], [0.5, 0.7])
        assert "0.6000" in t2
        p1 = str(tmp_path / "nr.png")
        plot_num_recall([0.4, 0.6], [100, 300], out_file=p1)
        p2 = str(tmp_path / "ir.png")
        plot_iou_recall([0.4, 0.3], [0.5, 0.7], out_file=p2)
        import os
        assert os.path.exists(p1) and os.path.exists(p2)


class TestBBoxCoders:
    """`mmdet/core/bbox/coder/` classes via build_bbox_coder."""

    def test_delta_coder_round_trip(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import build_bbox_coder
        coder = build_bbox_coder(dict(type="DeltaXYWHBBoxCoder",
                                      target_stds=(.1, .1, .2, .2)))
        priors = jnp.array([[0., 0., 10., 10.], [5., 5., 20., 25.]])
        gts = jnp.array([[1., 2., 11., 13.], [4., 6., 22., 24.]])
        d = coder.encode(priors, gts)
        back = coder.decode(priors, d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gts),
                                   atol=1e-4)
        clipped = coder.decode(priors, d, max_shape=(12, 12))
        assert float(clipped.max()) <= 12.0

    def test_tblr_coder_round_trip(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import build_bbox_coder
        coder = build_bbox_coder(dict(type="TBLRBBoxCoder", normalizer=4.0))
        priors = jnp.array([[0., 0., 10., 20.]])
        gts = jnp.array([[2., 3., 9., 18.]])
        enc = coder.encode(priors, gts)
        # top = cy - ymin = 10 - 3 = 7; / h=20 / 4 = 0.0875
        np.testing.assert_allclose(float(enc[0, 0]), 7 / 20 / 4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(coder.decode(priors, enc)),
                                   np.asarray(gts), atol=1e-4)

    def test_pseudo_and_distance_point(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.core import build_bbox_coder
        p = build_bbox_coder(dict(type="PseudoBBoxCoder"))
        x = jnp.ones((2, 4))
        assert p.decode(None, x) is x and p.encode(None, x) is x
        dp = build_bbox_coder(dict(type="DistancePointBBoxCoder"))
        pts = jnp.array([[5., 5.]])
        box = jnp.array([[2., 1., 9., 8.]])
        d = dp.encode(pts, box)
        np.testing.assert_allclose(np.asarray(dp.decode(pts, d)),
                                   np.asarray(box), atol=1e-5)
