"""SABL RetinaNet (`mmdet/models/dense_heads/sabl_retina_head.py` +
`core/bbox/coder/bucketing_bbox_coder.py`, ECCV'20 Side-Aware Boundary
Localization): each box side is localized by (a) a classification over
buckets spanning a scaled candidate region around the square anchor and
(b) a fine offset within the chosen bucket.

Coder: the candidate region is the anchor scaled by `scale_factor`; each
axis is split into `num_buckets`; side targets are the bucket whose center
is nearest the gt edge plus the normalized residual.  Decode takes the
argmax bucket per side.  All static shapes; bucket cls is plain CE over
buckets (the reference's top-2 soft labels are a training refinement).
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.assigner import max_iou_assign
from ..core.bbox import bbox_overlaps
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


def bucket_edges(anchors: jnp.ndarray, num_buckets: int,
                 scale_factor: float):
    """Candidate-region bucket centers per axis.
    anchors (N, 4) -> (x_centers (N, K), y_centers (N, K), bw (N,), bh (N,))
    """
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    w = (anchors[:, 2] - anchors[:, 0]) * scale_factor
    h = (anchors[:, 3] - anchors[:, 1]) * scale_factor
    bw = w / num_buckets
    bh = h / num_buckets
    k = jnp.arange(num_buckets, dtype=jnp.float32) + 0.5
    xc = (cx - w / 2)[:, None] + k[None, :] * bw[:, None]
    yc = (cy - h / 2)[:, None] + k[None, :] * bh[:, None]
    return xc, yc, bw, bh


def bucket_encode(anchors: jnp.ndarray, gts: jnp.ndarray, num_buckets: int,
                  scale_factor: float):
    """Per side: nearest-bucket label (N,) + normalized offset (N,)."""
    xc, yc, bw, bh = bucket_edges(anchors, num_buckets, scale_factor)
    out_lab, out_off = [], []
    for side, (centers, scale) in enumerate(
            [(xc, bw), (yc, bh), (xc, bw), (yc, bh)]):
        edge = gts[:, side]
        d = jnp.abs(centers - edge[:, None])
        lab = d.argmin(-1)
        cen = jnp.take_along_axis(centers, lab[:, None], 1)[:, 0]
        out_lab.append(lab.astype(jnp.int32))
        out_off.append((edge - cen) / jnp.maximum(scale, 1e-6))
    return jnp.stack(out_lab, -1), jnp.stack(out_off, -1)   # (N,4) each


def bucket_decode(anchors: jnp.ndarray, side_logits: jnp.ndarray,
                  side_offsets: jnp.ndarray, num_buckets: int,
                  scale_factor: float) -> jnp.ndarray:
    """side_logits/offsets (N, 4, K) -> xyxy boxes (N, 4)."""
    xc, yc, bw, bh = bucket_edges(anchors, num_buckets, scale_factor)
    edges = []
    for side, (centers, scale) in enumerate(
            [(xc, bw), (yc, bh), (xc, bw), (yc, bh)]):
        lab = side_logits[:, side].argmax(-1)
        cen = jnp.take_along_axis(centers, lab[:, None], 1)[:, 0]
        off = jnp.take_along_axis(side_offsets[:, side], lab[:, None],
                                  1)[:, 0]
        edges.append(cen + off * scale)
    x1 = jnp.minimum(edges[0], edges[2])
    x2 = jnp.maximum(edges[0], edges[2])
    y1 = jnp.minimum(edges[1], edges[3])
    y2 = jnp.maximum(edges[1], edges[3])
    return jnp.stack([x1, y1, x2, y2], -1)


@HEADS.register
class SABLRetinaHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_buckets: int = 14
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        dt = resolve_dtype(self.dtype)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        K = self.num_buckets
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="sabl_cls")
        side_cls_out = nn.Conv(4 * K, (3, 3), padding=1, dtype=dt,
                               name="side_cls")
        side_off_out = nn.Conv(4 * K, (3, 3), padding=1, dtype=dt,
                               name="side_offset")
        cls_l, scls_l, soff_l = [], [], []
        for f in feats:
            c = r = f if dt is None else f.astype(dt)
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_l.append(cls_out(c).astype(jnp.float32))
            scls_l.append(side_cls_out(r).astype(jnp.float32))
            soff_l.append(side_off_out(r).astype(jnp.float32))
        return tuple(cls_l), tuple(scls_l), tuple(soff_l)


@DETECTORS.register
class SABLRetinaNet(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    anchor_scale: float = 4.0
    num_buckets: int = 14
    scale_factor: float = 3.0
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = SABLRetinaHead(num_classes=self.num_classes,
                                     num_buckets=self.num_buckets,
                                     dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _square_anchors(self, cls_l):
        anchors = []
        for li, c in enumerate(cls_l):
            H, W = c.shape[1:3]
            s = float(self.strides[li])
            half = self.anchor_scale * s / 2
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * s
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * s
            gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
            ctr = jnp.stack([gx, gy], -1).reshape(-1, 2)
            anchors.append(jnp.concatenate([ctr - half, ctr + half], -1))
        return jnp.concatenate(anchors, 0)

    def _flat(self, cls_l, scls_l, soff_l):
        B = cls_l[0].shape[0]
        K = self.num_buckets
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_l], 1)
        scls = jnp.concatenate(
            [c.reshape(B, -1, 4, K) for c in scls_l], 1)
        soff = jnp.concatenate(
            [c.reshape(B, -1, 4, K) for c in soff_l], 1)
        return cls, scls, soff

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_l, scls_l, soff_l = self(images, train=True)
        anchors = self._square_anchors(cls_l)
        cls, scls, soff = self._flat(cls_l, scls_l, soff_l)
        K = self.num_buckets

        def single(gts, glabels, gvalid):
            ious = bbox_overlaps(gts, anchors)
            assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.5,
                                         neg_iou_thr=0.4)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            blab, boff = bucket_encode(anchors, gts[gidx], K,
                                       self.scale_factor)
            return pos, labels, blab, boff

        pos, labels, blab, boff = jax.vmap(single)(gt_boxes, gt_labels,
                                                   gt_valid)
        blab = jax.lax.stop_gradient(blab)
        boff = jax.lax.stop_gradient(boff)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_pos)
        w4 = pos[..., None].astype(jnp.float32).repeat(4, -1)
        loss_side_cls = losses.cross_entropy(scls, blab, weight=w4,
                                             avg_factor=4 * n_pos)
        pred_off = jnp.take_along_axis(soff, blab[..., None], -1)[..., 0]
        loss_side_off = losses.smooth_l1_loss(pred_off, boff, beta=1.0 / 9,
                                              weight=w4,
                                              avg_factor=4 * n_pos)
        return {"loss_cls": loss_cls, "loss_bbox_cls": loss_side_cls,
                "loss_bbox_reg": loss_side_off}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_l, scls_l, soff_l = self(images, train=False)
        anchors = self._square_anchors(cls_l)
        cls, scls, soff = self._flat(cls_l, scls_l, soff_l)
        B = cls.shape[0]
        prob = jax.nn.sigmoid(cls)
        boxes = jax.vmap(lambda sc, so: bucket_decode(
            anchors, sc, so, self.num_buckets, self.scale_factor))(scls, soff)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        flat = prob.reshape(B, -1)
        k = min(nms_pre, flat.shape[1])
        top_s, top_i = jax.lax.top_k(flat, k)
        ai = top_i // self.num_classes
        li = (top_i % self.num_classes).astype(jnp.int32)
        bx = jnp.take_along_axis(boxes, ai[..., None].repeat(4, -1), 1)
        if scale_factors is not None:
            bx = bx / scale_factors[:, None, :]
        valid = top_s > score_thr

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(bx, top_s, li, valid)


@HEADS.register
class SABLHead(nn.Module):
    """Two-stage SABL RCNN bbox head (`mmdet/models/roi_heads/bbox_heads/
    sabl_head.py`, configs/sabl/sabl_faster_rcnn_*): classification via
    2 FCs; localization per axis by squeezing the RoI grid to a 1-D
    profile, conv stack, x2 upsample to `num_buckets` positions, then
    per-side bucket classification + in-bucket offset regression
    (BucketingBBoxCoder num_buckets=14, scale_factor=1.7)."""
    num_classes: int = 80
    num_buckets: int = 14
    cls_out_channels: int = 1024
    reg_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (R, o, o, C) ->
        (cls (R, C+1), side_logits (R, 4, K), side_offsets (R, 4, K))
        with side order (x1, y1, x2, y2) matching bucket_encode."""
        dt = resolve_dtype(self.dtype)
        R, o, _, C = roi_feats.shape
        x = roi_feats if dt is None else roi_feats.astype(dt)
        # cls branch
        c = x.reshape(R, -1)
        c = nn.relu(nn.Dense(self.cls_out_channels, dtype=dt,
                             name="cls_fc0")(c))
        cls = nn.Dense(self.num_classes + 1, dtype=dt,
                       name="fc_cls")(c).astype(jnp.float32)
        # per-axis reg branches: squeeze -> conv x2 -> upsample x2 -> conv
        outs = {}
        for axis, name in ((1, "x"), (2, "y")):
            f = x.mean(axis=axis)                      # (R, o, C)
            for i in range(2):
                f = nn.relu(nn.Conv(self.reg_channels, (3,), padding=1,
                                    dtype=dt, name=f"{name}_pre{i}")(f))
            f = nn.relu(nn.ConvTranspose(self.reg_channels, (2,),
                                         strides=(2,), dtype=dt,
                                         name=f"{name}_up")(f))  # (R, 2o, C')
            f = nn.relu(nn.Conv(self.reg_channels, (3,), padding=1,
                                dtype=dt, name=f"{name}_post")(f))
            # 2 sides per axis: bucket cls + offset per upsampled position
            sc = nn.Conv(2, (1,), name=f"{name}_side_cls")(f)   # (R, K, 2)
            so = nn.Conv(2, (1,), name=f"{name}_side_off")(f)
            outs[name] = (sc.astype(jnp.float32), so.astype(jnp.float32))
        K = 2 * o
        assert K == self.num_buckets, (K, self.num_buckets)
        side_logits = jnp.stack(
            [outs["x"][0][..., 0], outs["y"][0][..., 0],
             outs["x"][0][..., 1], outs["y"][0][..., 1]], axis=1)  # (R,4,K)
        side_offsets = jnp.stack(
            [outs["x"][1][..., 0], outs["y"][1][..., 0],
             outs["x"][1][..., 1], outs["y"][1][..., 1]], axis=1)
        return cls, side_logits, side_offsets


@DETECTORS.register
class SABLFasterRCNN(nn.Module):
    """Faster R-CNN with the SABL RCNN head
    (configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py).  Wraps the
    standard TwoStageDetector RPN/proposal/sampling machinery and swaps
    the RoI head's delta coder for the bucketing coder."""
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    num_buckets: int = 14
    scale_factor: float = 1.7
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None

    def setup(self):
        from .detectors import TwoStageDetector
        self.inner = TwoStageDetector(
            backbone=self.backbone, num_classes=self.num_classes,
            neck=self.neck, train_cfg=self.train_cfg,
            test_cfg=self.test_cfg, compute_dtype=self.compute_dtype,
            name="two_stage")
        self.sabl_head = SABLHead(num_classes=self.num_classes,
                                  num_buckets=self.num_buckets,
                                  dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.inner.extract_feat(images, train=train)
        rpn_out = self.inner.rpn_m(feats)
        B = images.shape[0]
        dummy = jnp.zeros((B * 8, 5), jnp.float32)
        roi_feats = self.inner._roi_extract(feats, dummy)
        return self.sabl_head(roi_feats)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None, pano_ratio_v=None):
        from .detectors import default_train_cfg
        from .roi_head import sample_rois_for_training
        from .rpn_head import rpn_loss, rpn_proposals
        from ..core.bbox import delta_decode
        tc = self.train_cfg or default_train_cfg()
        inner = self.inner
        feats = inner.extract_feat(images, train=True)
        cls_scores, bbox_preds = inner.rpn_m(feats)
        level_anchors, anchors = inner._anchors(cls_scores)
        rng = self.make_rng("sampler")
        rng_rpn, rng_rcnn = jax.random.split(rng)
        losses_out = rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes,
                              gt_valid, rng_rpn,
                              target_stds=inner.rpn_target_stds, **tc["rpn"])
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                          target_stds=inner.rpn_target_stds,
                          **tc["rpn_proposal"]))
        samples = sample_rois_for_training(
            rng_rcnn, props.boxes, props.mask, gt_boxes, gt_labels, gt_valid,
            self.num_classes, target_stds=inner.rcnn_target_stds,
            **tc["rcnn"])
        B, S, _ = samples.rois.shape
        flat_rois = samples.rois.reshape(B * S, 5)
        cls, slog, soff = self.sabl_head(inner._roi_extract(feats, flat_rois))
        labels = samples.labels.reshape(-1)
        lw = samples.label_weights.reshape(-1)
        losses_out["loss_cls"] = losses.cross_entropy(
            cls, labels, weight=lw, avg_factor=jnp.maximum(lw.sum(), 1.0))
        # recover matched gt boxes from the delta targets, then bucket-encode
        gt_match = delta_decode(flat_rois[:, 1:5],
                                samples.bbox_targets.reshape(-1, 4),
                                stds=inner.rcnn_target_stds)
        blab, boff = bucket_encode(flat_rois[:, 1:5], gt_match,
                                   self.num_buckets, self.scale_factor)
        bw = samples.bbox_weights.reshape(-1)
        K = self.num_buckets
        onehot = jax.nn.one_hot(blab, K)                       # (N, 4, K)
        navg = jnp.maximum(bw.sum(), 1.0)
        losses_out["loss_bbox_cls"] = losses.binary_cross_entropy(
            slog, onehot, weight=bw[:, None, None], avg_factor=navg * 4 * K)
        off_pred = jnp.take_along_axis(soff, blab[..., None], -1)[..., 0]
        losses_out["loss_bbox_reg"] = losses.smooth_l1_loss(
            off_pred, boff, beta=0.1, weight=bw[:, None],
            avg_factor=navg * 4)
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        from .detectors import default_test_cfg
        from .rpn_head import rpn_proposals
        from .roi_head import bbox_head_detections
        from ..core.bbox import delta_encode
        cfg = self.test_cfg or default_test_cfg()
        inner = self.inner
        feats = inner.extract_feat(images, train=False)
        cls_scores, bbox_preds = inner.rpn_m(feats)
        level_anchors, _ = inner._anchors(cls_scores)
        props = rpn_proposals(cls_scores, bbox_preds, level_anchors,
                              img_shapes, target_stds=inner.rpn_target_stds,
                              **cfg["rpn"])
        B, P, _ = props.boxes.shape
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], props.boxes], axis=-1)
        flat = rois.reshape(B * P, 5)
        cls, slog, soff = self.sabl_head(inner._roi_extract(feats, flat))
        boxes = bucket_decode(flat[:, 1:5], slog, soff, self.num_buckets,
                              self.scale_factor)
        # express the decoded boxes as class-agnostic deltas so the
        # standard decode+multiclass-NMS path applies unchanged
        reg = delta_encode(flat[:, 1:5], boxes, stds=inner.rcnn_target_stds)
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, 4), rois, img_shapes,
            self.num_classes, target_stds=inner.rcnn_target_stds,
            roi_mask=props.mask, scale_factors=scale_factors, **cfg["rcnn"])


@DETECTORS.register
class SABLCascadeRCNN(nn.Module):
    """Cascade R-CNN with SABL bbox heads per stage
    (configs/sabl/sabl_cascade_rcnn_r50_fpn_1x_coco.py): three bucketing
    heads with rising IoU thresholds (0.5/0.6/0.7) and shrinking candidate
    regions (scale_factor 1.7/1.5/1.3); boxes refine stage-to-stage via
    bucket decode, class scores average across stages at test time."""
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    num_buckets: int = 14
    num_stages: int = 3
    stage_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_scale_factors: Tuple[float, ...] = (1.7, 1.5, 1.3)
    stage_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None

    def setup(self):
        from .detectors import TwoStageDetector
        self.inner = TwoStageDetector(
            backbone=self.backbone, num_classes=self.num_classes,
            neck=self.neck, train_cfg=self.train_cfg,
            test_cfg=self.test_cfg, compute_dtype=self.compute_dtype,
            name="two_stage")
        self.sabl_heads = [
            SABLHead(num_classes=self.num_classes,
                     num_buckets=self.num_buckets,
                     dtype=self.compute_dtype, name=f"sabl_head_{t}")
            for t in range(self.num_stages)
        ]

    def __call__(self, images, train: bool = False):
        feats = self.inner.extract_feat(images, train=train)
        self.inner.rpn_m(feats)
        B = images.shape[0]
        dummy = jnp.zeros((B * 8, 5), jnp.float32)
        rf = self.inner._roi_extract(feats, dummy)
        return tuple(h(rf) for h in self.sabl_heads)

    def _stage_loss(self, head, scale_factor, feats, samples):
        """SABL losses for one cascade stage + bucket-decoded boxes."""
        from ..core.bbox import delta_decode
        inner = self.inner
        B, S, _ = samples.rois.shape
        flat_rois = samples.rois.reshape(B * S, 5)
        cls, slog, soff = head(inner._roi_extract(feats, flat_rois))
        labels = samples.labels.reshape(-1)
        lw = samples.label_weights.reshape(-1)
        out = {"loss_cls": losses.cross_entropy(
            cls, labels, weight=lw, avg_factor=jnp.maximum(lw.sum(), 1.0))}
        gt_match = delta_decode(flat_rois[:, 1:5],
                                samples.bbox_targets.reshape(-1, 4),
                                stds=inner.rcnn_target_stds)
        blab, boff = bucket_encode(flat_rois[:, 1:5], gt_match,
                                   self.num_buckets, scale_factor)
        bw = samples.bbox_weights.reshape(-1)
        K = self.num_buckets
        navg = jnp.maximum(bw.sum(), 1.0)
        out["loss_bbox_cls"] = losses.binary_cross_entropy(
            slog, jax.nn.one_hot(blab, K), weight=bw[:, None, None],
            avg_factor=navg * 4 * K)
        off_pred = jnp.take_along_axis(soff, blab[..., None], -1)[..., 0]
        out["loss_bbox_reg"] = losses.smooth_l1_loss(
            off_pred, boff, beta=0.1, weight=bw[:, None], avg_factor=navg * 4)
        dec = bucket_decode(flat_rois[:, 1:5], slog, soff, self.num_buckets,
                            scale_factor).reshape(B, S, 4)
        return out, dec

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None, pano_ratio_v=None):
        from .detectors import default_train_cfg
        from .roi_head import sample_rois_for_training
        from .rpn_head import rpn_loss, rpn_proposals
        tc = self.train_cfg or default_train_cfg()
        inner = self.inner
        feats = inner.extract_feat(images, train=True)
        cls_scores, bbox_preds = inner.rpn_m(feats)
        level_anchors, anchors = inner._anchors(cls_scores)
        rng = self.make_rng("sampler")
        rngs = jax.random.split(rng, self.num_stages + 1)
        losses_out = rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes,
                              gt_valid, rngs[0],
                              target_stds=inner.rpn_target_stds, **tc["rpn"])
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                          target_stds=inner.rpn_target_stds,
                          **tc["rpn_proposal"]))
        boxes, mask = props.boxes, props.mask
        rcnn_cfg = dict(tc["rcnn"])
        for t in range(self.num_stages):
            iou = self.stage_ious[t]
            rcnn_cfg.update(pos_iou_thr=iou, neg_iou_thr=iou, min_pos_iou=iou)
            samples = sample_rois_for_training(
                rngs[t + 1], boxes, mask, gt_boxes, gt_labels, gt_valid,
                self.num_classes, target_stds=inner.rcnn_target_stds,
                **rcnn_cfg)
            stage, dec = self._stage_loss(
                self.sabl_heads[t], self.stage_scale_factors[t], feats,
                samples)
            for k, v in stage.items():
                losses_out[f"s{t}.{k}"] = v * self.stage_weights[t]
            if t < self.num_stages - 1:
                boxes = jax.lax.stop_gradient(dec)
                mask = samples.label_weights > 0
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        from .detectors import default_test_cfg
        from .rpn_head import rpn_proposals
        from .roi_head import bbox_head_detections
        cfg = self.test_cfg or default_test_cfg()
        inner = self.inner
        feats = inner.extract_feat(images, train=False)
        cls_scores, bbox_preds = inner.rpn_m(feats)
        level_anchors, _ = inner._anchors(cls_scores)
        props = rpn_proposals(cls_scores, bbox_preds, level_anchors,
                              img_shapes, target_stds=inner.rpn_target_stds,
                              **cfg["rpn"])
        B, P, _ = props.boxes.shape
        boxes = props.boxes
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None, None], (B, P, 1))
        stage_scores = []
        for t in range(self.num_stages):
            rois = jnp.concatenate([bidx, boxes], axis=-1)
            flat = rois.reshape(B * P, 5)
            cls, slog, soff = self.sabl_heads[t](inner._roi_extract(feats,
                                                                    flat))
            stage_scores.append(jax.nn.softmax(cls.reshape(B, P, -1), -1))
            dec = bucket_decode(flat[:, 1:5], slog, soff, self.num_buckets,
                                self.stage_scale_factors[t])
            h = jnp.repeat(img_shapes[:, 0], P)
            w = jnp.repeat(img_shapes[:, 1], P)
            x = jnp.clip(dec[:, 0::2], 0, w[:, None])
            y = jnp.clip(dec[:, 1::2], 0, h[:, None])
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]],
                              -1).reshape(B, P, 4)
        avg = sum(stage_scores) / self.num_stages
        rois = jnp.concatenate([bidx, boxes], axis=-1)
        zero_reg = jnp.zeros((B, P, 4), jnp.float32)
        return bbox_head_detections(
            jnp.log(jnp.clip(avg, 1e-9)), zero_reg, rois, img_shapes,
            self.num_classes, target_stds=(1.0, 1.0, 1.0, 1.0),
            roi_mask=props.mask, scale_factors=scale_factors, **cfg["rcnn"])
