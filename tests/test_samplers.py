"""Sampler-zoo parity: InstanceBalancedPos / IoUBalancedNeg / Combined
(Libra R-CNN), ScoreHLR (PISA ISR-N), neg_pos_ub cap, and the nms_match
grouping op.

Reference: `mmdet/core/bbox/samplers/{instance_balanced_pos_sampler,
iou_balanced_neg_sampler,combined_sampler,score_hlr_sampler}.py`,
`mmcv.ops.nms_match`, `configs/libra_rcnn/`, `configs/pisa/`.
"""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.core.sampler import (
    combined_sample, instance_balanced_pos_sample, iou_balanced_neg_sample,
    random_sample)
from panoswintransformerobjectdetection_tpu.ops.nms import nms_match
from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


class TestInstanceBalancedPos:
    def test_small_instances_survive(self):
        # gt1 owns 20 anchors, gt2 only 2; plain random sampling would
        # almost surely drown gt2 — balanced sampling must keep both
        assigned = jnp.array([1] * 20 + [2] * 2 + [0] * 30 + [-1] * 4)
        pi, pm = instance_balanced_pos_sample(jax.random.PRNGKey(0),
                                              assigned, 32, 0.25)
        sel = np.asarray(assigned[pi])[np.asarray(pm)]
        assert pm.sum() == 8
        assert (sel == 2).sum() == 2        # the rare instance fully kept
        assert (sel == 1).sum() == 6

    def test_under_quota_takes_all(self):
        assigned = jnp.array([1, 2, 0, 0, 0, 0, -1, 0])
        _, pm = instance_balanced_pos_sample(jax.random.PRNGKey(0),
                                             assigned, 16, 0.25)
        assert pm.sum() == 2


class TestIoUBalancedNeg:
    def test_bins_evenly_sampled(self):
        # 30 negs spread uniformly in IoU [0, .45]; 22 positives at .8
        assigned = jnp.array([1] * 22 + [0] * 30 + [-1] * 4)
        max_ious = jnp.concatenate([jnp.ones(22) * 0.8,
                                    jnp.linspace(0.0, 0.45, 30),
                                    jnp.zeros(4)])
        ni, nm = iou_balanced_neg_sample(jax.random.PRNGKey(1), assigned,
                                         max_ious, 24, jnp.asarray(8))
        sel = np.asarray(max_ious[ni])[np.asarray(nm)]
        assert nm.sum() == 16
        hist, _ = np.histogram(sel, bins=3, range=(0.0, 0.45))
        # per-bin quota floor(16/3)=5; one bin absorbs the random fill
        assert hist.min() >= 5 and hist.sum() == 16

    def test_all_negs_when_under_quota(self):
        assigned = jnp.array([1] * 2 + [0] * 5 + [-1])
        max_ious = jnp.concatenate([jnp.ones(2) * .8, jnp.linspace(0, .4, 5),
                                    jnp.zeros(1)])
        _, nm = iou_balanced_neg_sample(jax.random.PRNGKey(2), assigned,
                                        max_ious, 32, jnp.asarray(2))
        assert nm.sum() == 5

    def test_floor_split(self):
        # floor_thr=.1: low-IoU floor set only fills after binned negs
        assigned = jnp.array([0] * 40)
        max_ious = jnp.concatenate([jnp.zeros(20),
                                    jnp.linspace(0.15, 0.45, 20)])
        ni, nm = iou_balanced_neg_sample(
            jax.random.PRNGKey(3), assigned, max_ious, 16, jnp.asarray(0),
            floor_thr=0.1, floor_fraction=0.5, num_bins=2)
        sel = np.asarray(max_ious[ni])[np.asarray(nm)]
        assert nm.sum() == 16
        # quota split: 8 from the >= .1 bins, 8 from the floor set
        assert (sel >= 0.1).sum() == 8 and (sel < 0.1).sum() == 8


class TestCombinedAndCaps:
    def test_combined_shapes(self):
        assigned = jnp.array([1] * 6 + [2] * 2 + [0] * 40 + [-1] * 2)
        max_ious = jnp.clip(jnp.linspace(0, 1, 50), 0, 0.9)
        s = combined_sample(jax.random.PRNGKey(4), assigned, max_ious,
                            32, 0.25)
        assert s.pos_mask.sum() == 8
        assert s.neg_mask.sum() == 24
        assert np.all(np.asarray(assigned[s.pos_inds])[np.asarray(s.pos_mask)] > 0)
        assert np.all(np.asarray(assigned[s.neg_inds])[np.asarray(s.neg_mask)] == 0)

    def test_neg_pos_ub(self):
        # Libra rpn recipe: negatives capped at 5x positives
        assigned = jnp.array([1] * 2 + [0] * 60)
        s = random_sample(jax.random.PRNGKey(5), assigned, 32, 0.25,
                          neg_pos_ub=5)
        assert s.pos_mask.sum() == 2
        assert s.neg_mask.sum() == 10


def _np_nms_match(boxes, scores, thr):
    """Scalar greedy NMS-match oracle (mmcv.ops.nms_match semantics)."""
    order = np.argsort(-scores, kind="stable")
    leader = np.full(len(boxes), -1)
    keep = np.zeros(len(boxes), bool)
    for i in order:
        if leader[i] >= 0:
            continue
        keep[i] = True
        leader[i] = i
        for j in order:
            if leader[j] >= 0:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-6) > thr:
                leader[j] = i
    return leader, keep


class TestNMSMatch:
    def test_vs_scalar_oracle(self):
        r = np.random.default_rng(7)
        xy = r.uniform(0, 60, (64, 2))
        wh = r.uniform(5, 30, (64, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = r.random(64).astype(np.float32)
        leader, rank, keep = nms_match(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5)
        ref_leader, ref_keep = _np_nms_match(boxes, scores, 0.5)
        assert np.array_equal(np.asarray(keep), ref_keep)
        assert np.array_equal(np.asarray(leader), ref_leader)
        # rank: 0 for leaders, contiguous within groups
        rank = np.asarray(rank)
        for g in np.unique(ref_leader):
            members = np.where(ref_leader == g)[0]
            assert sorted(rank[members]) == list(range(len(members)))

    def test_valid_mask(self):
        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.array([0.5, 0.9])
        valid = jnp.array([True, False])
        leader, _, keep = nms_match(boxes, scores, 0.5, valid)
        assert bool(keep[0]) and not bool(keep[1])
        assert int(leader[0]) == 0


BB = {"type": "ResNet", "depth": 18}
NECK = {"type": "FPN", "in_channels": (64, 128, 256, 512),
        "out_channels": 16, "num_outs": 5}
TRAIN_CFG = {
    "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
            "num_samples": 16, "pos_fraction": 0.5},
    "rpn_proposal": {"nms_pre": 32, "max_per_img": 16,
                     "iou_threshold": 0.7, "min_bbox_size": 0},
    "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
             "num_samples": 16, "pos_fraction": 0.25},
}


def _train_batch(B=2, H=64, W=128, G=3):
    r = np.random.default_rng(0)
    return dict(
        images=jnp.asarray(r.random((B, H, W, 3)), jnp.float32),
        img_shapes=jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1)),
        gt_boxes=jnp.asarray(r.uniform(0, 40, (B, G, 4)).cumsum(-1),
                             jnp.float32),
        gt_labels=jnp.zeros((B, G), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
    )


def _run_train(extra_train_cfg, extra_model=None):
    tc = {k: dict(v) for k, v in TRAIN_CFG.items()}
    for k, v in extra_train_cfg.items():
        tc[k].update(v)
    cfg = {"type": "FasterRCNN", "backbone": BB, "neck": NECK,
           "num_classes": 5, "train_cfg": tc}
    cfg.update(extra_model or {})
    det = build(DETECTORS, cfg)
    b = _train_batch()
    vs = det.init(jax.random.PRNGKey(0), b["images"])
    out = det.apply(vs, **b, method=det.forward_train,
                    rngs={"sampler": jax.random.PRNGKey(1)})
    assert all(np.isfinite(float(v)) for v in out.values()), out
    return out


class TestEndToEnd:
    def test_libra_combined_sampler_balanced_l1(self):
        """The full configs/libra_rcnn recipe: combined sampler + BalancedL1
        rcnn loss + non-local BFP + rpn neg_pos_ub."""
        _run_train(
            {"rpn": {"neg_pos_ub": 5},
             "rcnn": {"sampler": dict(pos_sampler="instance_balanced",
                                      neg_sampler="iou_balanced",
                                      floor_thr=-1, floor_fraction=0,
                                      num_bins=3),
                      "reg_loss": "balanced_l1"}},
            {"neck": [dict(type="FPN", in_channels=(64, 128, 256, 512),
                           out_channels=16, num_outs=5),
                      dict(type="BFP", in_channels=16, num_levels=5,
                           refine_level=2, refine_type="non_local")]})

    def test_pisa_score_hlr(self):
        """configs/pisa recipe: ScoreHLR negative reweighting + ISR-P/CARL."""
        out = _run_train(
            {"rcnn": {"sampler": dict(type="score_hlr", k=0.5, bias=0.0,
                                      score_thr=0.05, iou_thr=0.5)}},
            {"pisa": {"isr_k": 2.0, "isr_bias": 0.0, "carl_k": 1.0,
                      "carl_bias": 0.2}})
        assert "loss_carl" in out

    def test_score_hlr_weights_properties(self):
        """Direct check of score_hlr_reweight: selection count matches the
        quota, selected weights positive, CE total preserved (norm_ratio)."""
        from panoswintransformerobjectdetection_tpu.models.roi_head import (
            RoISamples, score_hlr_reweight)
        r = np.random.default_rng(3)
        B, S, C = 2, 32, 5
        xy = r.uniform(0, 50, (B, S, 2))
        wh = r.uniform(4, 20, (B, S, 2))
        rois = np.concatenate([
            np.repeat(np.arange(B, dtype=np.float32)[:, None, None], S, 1),
            xy, xy + wh], -1).astype(np.float32)
        labels = np.full((B, S), C)
        labels[:, :4] = r.integers(0, C, (B, 4))     # 8 positives
        samples = RoISamples(
            rois=jnp.asarray(rois), labels=jnp.asarray(labels),
            label_weights=jnp.ones((B, S)),
            bbox_targets=jnp.zeros((B, S, 4)),
            bbox_weights=jnp.asarray((labels < C).astype(np.float32)))
        cls_logits = jnp.asarray(r.normal(0, 2, (B * S, C + 1)), jnp.float32)
        bbox_pred = jnp.asarray(r.normal(0, .1, (B * S, 4 * C)), jnp.float32)
        n_pos = int((labels < C).sum())
        num_expected = jnp.asarray(S // 2 - n_pos // 2)
        new_lw = score_hlr_reweight(
            jax.random.PRNGKey(0), cls_logits, bbox_pred, samples, C,
            num_expected)
        new_lw = np.asarray(new_lw)
        neg = labels == C
        assert (new_lw[neg] > 0).sum() == int(num_expected)
        assert np.all(new_lw[~neg] == 1.0)           # positives untouched
        # sum-preserving normalization of the negative CE
        logits = np.asarray(cls_logits).reshape(B, S, -1)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        nll = -logp[..., C]
        sel = (new_lw > 0) & neg
        np.testing.assert_allclose((nll * sel)[neg].sum(),
                                   (nll * new_lw)[neg].sum(), rtol=1e-4)
