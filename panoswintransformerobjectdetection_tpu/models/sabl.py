"""SABL RetinaNet (`mmdet/models/dense_heads/sabl_retina_head.py` +
`core/bbox/coder/bucketing_bbox_coder.py`, ECCV'20 Side-Aware Boundary
Localization): each box side is localized by (a) a classification over
`side_num = ceil(num_buckets/2)` buckets measured inward from that side of
the scale_factor-rescaled candidate region and (b) a fine offset within
the chosen bucket.

Coder semantics match `bbox2bucket`/`bucket2bbox`
(`bucketing_bbox_coder.py:144,268`) exactly, fixed-shape: top-1 one-hot
bucket labels; `offset_topk=2` fine-regression weights (the 2nd-nearest
bucket also regresses when its normalized offset < offset_upperbound);
`cls_ignore_neighbor` zeroes cls weights on near-but-not-label buckets;
decode argmaxes per side and adds the bucketing-guided rescoring
confidence (top-1 softmax prob, + top-2 when adjacent).  Golden-parity
tested vs the reference torch coder in tests/test_sabl_parity.py.
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


def side_num_of(num_buckets: int) -> int:
    return int(np.ceil(num_buckets / 2.0))


def bbox_rescale(bboxes: jnp.ndarray, scale_factor: float = 1.0):
    """Rescale xyxy boxes about their centers (`transforms.py bbox_rescale`)."""
    cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
    cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
    w = (bboxes[:, 2] - bboxes[:, 0]) * scale_factor
    h = (bboxes[:, 3] - bboxes[:, 1]) * scale_factor
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], -1)


def bucket_edges(proposals: jnp.ndarray, num_buckets: int,
                 scale_factor: float):
    """Side-aware bucket centers (`generat_buckets:95`): each side has
    `side_num` buckets measured INWARD from that side of the rescaled
    proposal.  Returns (centers (N, 4, side_num) in side order
    (l, r, t, d), bucket_w (N,), bucket_h (N,))."""
    p = bbox_rescale(proposals, scale_factor)
    side = side_num_of(num_buckets)
    bw = (p[:, 2] - p[:, 0]) / num_buckets
    bh = (p[:, 3] - p[:, 1]) / num_buckets
    k = jnp.arange(side, dtype=jnp.float32) + 0.5
    l = p[:, 0, None] + k[None, :] * bw[:, None]
    r = p[:, 2, None] - k[None, :] * bw[:, None]
    t = p[:, 1, None] + k[None, :] * bh[:, None]
    d = p[:, 3, None] - k[None, :] * bh[:, None]
    return jnp.stack([l, r, t, d], axis=1), bw, bh


def bucket_encode(proposals: jnp.ndarray, gts: jnp.ndarray, num_buckets: int,
                  scale_factor: float, offset_topk: int = 2,
                  offset_upperbound: float = 1.0,
                  cls_ignore_neighbor: bool = True):
    """`bbox2bucket:144` exactly.  Returns
    (offsets (N, 4, side), offset_weights (N, 4, side),
     labels (N, 4) int32 top-1 bucket per side, cls_weights (N, 4, side))
    in side order (l, r, t, d) = gt edges (x1, x2, y1, y2)."""
    centers, bw, bh = bucket_edges(proposals, num_buckets, scale_factor)
    scale = jnp.stack([bw, bw, bh, bh], 1)[..., None]        # (N, 4, 1)
    # eps guard for PADDED/degenerate rois (zero extent) — the reference
    # only ever encodes real sampled positives; here fixed-shape batches
    # carry padding rows whose weights are zero, but 0 * inf would still
    # poison the loss with NaN
    scale = jnp.where(jnp.abs(scale) < 1e-6, 1e-6, scale)
    edges = jnp.stack([gts[:, 0], gts[:, 2], gts[:, 1], gts[:, 3]], 1)
    offsets = (centers - edges[..., None]) / scale           # (N, 4, side)

    absoff = jnp.abs(offsets)
    side = offsets.shape[-1]
    k = min(offset_topk, side)
    # top-k NEAREST buckets per side (ascending |offset|)
    topk_neg, topk_idx = jax.lax.top_k(-absoff, k)
    topk = -topk_neg
    onehot = jax.nn.one_hot(topk_idx, side)                  # (N, 4, k, side)
    w_k = jnp.concatenate(
        [jnp.ones_like(topk[..., :1]),
         (topk[..., 1:] < offset_upperbound).astype(jnp.float32)], -1)
    offset_weights = jnp.max(onehot * w_k[..., None], axis=2)

    labels = topk_idx[..., 0].astype(jnp.int32)              # (N, 4)
    lab_onehot = jax.nn.one_hot(labels, side)
    near = (absoff < 1.0).astype(jnp.float32)
    if cls_ignore_neighbor:
        cls_weights = 1.0 - near * (1.0 - lab_onehot)
    else:
        cls_weights = jnp.ones_like(near)
    return offsets, offset_weights, labels, cls_weights


def bucket_decode(proposals: jnp.ndarray, side_logits: jnp.ndarray,
                  side_offsets: jnp.ndarray, num_buckets: int,
                  scale_factor: float, max_shape=None, clip_border=True):
    """`bucket2bbox:268`: side_logits/offsets (N, 4, side) in (l, r, t, d)
    order -> (xyxy boxes (N, 4), loc_confidence (N,) bucketing-guided
    rescoring: top-1 softmax prob + top-2 when the buckets are adjacent)."""
    centers, bw, bh = bucket_edges(proposals, num_buckets, scale_factor)
    scale = jnp.stack([bw, bw, bh, bh], 1)                   # (N, 4)
    scores = jax.nn.softmax(side_logits, -1)
    top2, top2_idx = jax.lax.top_k(scores, 2)
    lab = top2_idx[..., 0]
    cen = jnp.take_along_axis(centers, lab[..., None], 2)[..., 0]   # (N, 4)
    off = jnp.take_along_axis(side_offsets, lab[..., None], 2)[..., 0]
    edge = cen - off * scale                                 # (N, 4) l,r,t,d
    x1, x2, y1, y2 = edge[:, 0], edge[:, 1], edge[:, 2], edge[:, 3]
    if clip_border and max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], -1)
    neighbor = (jnp.abs(top2_idx[..., 0] - top2_idx[..., 1]) == 1)
    conf = top2[..., 0] + top2[..., 1] * neighbor.astype(jnp.float32)
    return boxes, conf.mean(-1)


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
        side = side_num_of(self.num_buckets)
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="sabl_cls")
        side_cls_out = nn.Conv(4 * side, (3, 3), padding=1, dtype=dt,
                               name="side_cls")
        side_off_out = nn.Conv(4 * side, (3, 3), padding=1, dtype=dt,
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
        side = side_num_of(self.num_buckets)
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_l], 1)
        scls = jnp.concatenate(
            [c.reshape(B, -1, 4, side) for c in scls_l], 1)
        soff = jnp.concatenate(
            [c.reshape(B, -1, 4, side) for c in soff_l], 1)
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
            boff, bow, blab, bcw = bucket_encode(anchors, gts[gidx], K,
                                                 self.scale_factor)
            posf = pos.astype(jnp.float32)[:, None, None]
            return pos, labels, blab, boff, bow * posf, bcw * posf

        pos, labels, blab, boff, bow, bcw = jax.vmap(single)(
            gt_boxes, gt_labels, gt_valid)
        blab, boff = map(jax.lax.stop_gradient, (blab, boff))
        bow, bcw = map(jax.lax.stop_gradient, (bow, bcw))
        n_pos = jnp.maximum(pos.sum(), 1.0)
        side = side_num_of(K)
        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_pos)
        # `sabl_retina_head.py:456-465`: BCE over one-hot bucket labels
        # weighted by cls_ignore_neighbor weights; smooth-L1(1/9) over ALL
        # side buckets weighted by the offset_topk=2 weights, both x1.5
        onehot = jax.nn.one_hot(blab, side)
        loss_side_cls = 1.5 * losses.binary_cross_entropy(
            scls, onehot, weight=bcw, avg_factor=n_pos * 4 * side)
        loss_side_off = 1.5 * losses.smooth_l1_loss(
            soff, boff, beta=1.0 / 9, weight=bow, avg_factor=n_pos * 4 * 2)
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
        boxes, confids = jax.vmap(lambda sc, so: bucket_decode(
            anchors, sc, so, self.num_buckets, self.scale_factor))(scls, soff)
        # bucketing-guided rescoring (`sabl_retina_head.py:620`
        # score_factors=mlvl_confids)
        prob = prob * confids[..., None]
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
            # one bucket-cls + one offset per upsampled position, then the
            # side-aware split (`sabl_head.py:265`): near side = first
            # side_num positions, far side = last side_num REVERSED (both
            # sides' buckets count inward from their edge)
            sc = nn.Conv(1, (1,), name=f"{name}_side_cls")(f)[..., 0]
            so = nn.Conv(1, (1,), name=f"{name}_side_off")(f)[..., 0]
            outs[name] = (sc.astype(jnp.float32), so.astype(jnp.float32))
        K = 2 * o
        assert K == self.num_buckets, (K, self.num_buckets)
        side = side_num_of(K)

        def split(f):
            near = f[:, :side]
            far = jnp.flip(f[:, K - side:], axis=1)
            return near, far

        lx, rx = split(outs["x"][0])
        ty, dy = split(outs["y"][0])
        lox, rox = split(outs["x"][1])
        toy, doy = split(outs["y"][1])
        side_logits = jnp.stack([lx, rx, ty, dy], axis=1)      # (R, 4, side)
        side_offsets = jnp.stack([lox, rox, toy, doy], axis=1)
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
        K = self.num_buckets
        side = side_num_of(K)
        boff, bow, blab, bcw = bucket_encode(flat_rois[:, 1:5], gt_match,
                                             K, self.scale_factor)
        bw = samples.bbox_weights.reshape(-1)[:, None, None]
        navg = jnp.maximum(samples.bbox_weights.sum(), 1.0)
        onehot = jax.nn.one_hot(blab, side)
        losses_out["loss_bbox_cls"] = losses.binary_cross_entropy(
            slog, onehot, weight=bcw * bw, avg_factor=navg * 4 * side)
        losses_out["loss_bbox_reg"] = losses.smooth_l1_loss(
            soff, boff, beta=0.1, weight=bow * bw, avg_factor=navg * 4 * 2)
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
        boxes, conf = bucket_decode(flat[:, 1:5], slog, soff,
                                    self.num_buckets, self.scale_factor)
        # express the decoded boxes as class-agnostic deltas so the
        # standard decode+multiclass-NMS path applies unchanged; the
        # bucketing-guided confidence rescores classes (`sabl_head.py`
        # get_bboxes score_factors)
        reg = delta_encode(flat[:, 1:5], boxes, stds=inner.rcnn_target_stds)
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, 4), rois, img_shapes,
            self.num_classes, target_stds=inner.rcnn_target_stds,
            roi_mask=props.mask, scale_factors=scale_factors,
            score_factors=conf.reshape(B, P), **cfg["rcnn"])


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
        K = self.num_buckets
        side = side_num_of(K)
        boff, bow, blab, bcw = bucket_encode(flat_rois[:, 1:5], gt_match,
                                             K, scale_factor)
        bw = samples.bbox_weights.reshape(-1)[:, None, None]
        navg = jnp.maximum(samples.bbox_weights.sum(), 1.0)
        out["loss_bbox_cls"] = losses.binary_cross_entropy(
            slog, jax.nn.one_hot(blab, side), weight=bcw * bw,
            avg_factor=navg * 4 * side)
        out["loss_bbox_reg"] = losses.smooth_l1_loss(
            soff, boff, beta=0.1, weight=bow * bw, avg_factor=navg * 4 * 2)
        dec, _ = bucket_decode(flat_rois[:, 1:5], slog, soff,
                               self.num_buckets, scale_factor)
        return out, dec.reshape(B, S, 4)

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
            dec, _ = bucket_decode(flat[:, 1:5], slog, soff,
                                   self.num_buckets,
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
