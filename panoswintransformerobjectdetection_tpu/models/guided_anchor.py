"""Guided Anchoring (`mmdet/models/dense_heads/guided_anchor_head.py` /
`ga_retina_head.py`, CVPR'19): instead of a dense fixed anchor grid, each
cell predicts (a) an anchor-location probability, (b) an anchor shape
(w, h = base * exp(dw, dh)), and the tower features are adapted by a
deformable conv conditioned on the predicted shape before the usual
cls / reg heads run against the GUIDED anchors.

Fixed-shape training: location targets are FSAF-style center regions on the
scale-matched level; shape and cls/reg targets assign against the guided
anchors themselves (stop-gradient through assignment, gradient through the
shape via the bounded-IoU loss).
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.assigner import max_iou_assign
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


def bounded_iou_loss(pred_wh: jnp.ndarray, tgt_wh: jnp.ndarray,
                     beta: float = 0.2, eps: float = 1e-3) -> jnp.ndarray:
    """`iou_loss.py BoundedIoULoss` restricted to shapes (same center):
    per-side loss on min(w, w*)/max(w, w*)."""
    lw = 1 - jnp.minimum(pred_wh, tgt_wh) / jnp.maximum(
        jnp.maximum(pred_wh, tgt_wh), eps)
    return jnp.where(lw < beta, 0.5 * lw * lw / beta,
                     lw - 0.5 * beta).sum(-1)


@HEADS.register
class GuidedAnchorHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
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
        loc_out = nn.Conv(1, (1, 1), dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="conv_loc")
        shape_out = nn.Conv(2, (1, 1), dtype=dt, name="conv_shape")
        off_conv = nn.Conv(18, (1, 1), kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="feature_adaption_offset")
        adapt_w = self.param("feature_adaption_kernel",
                             nn.initializers.he_normal(),
                             (9, self.feat_channels, self.feat_channels))
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="ga_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=dt, name="ga_reg")
        loc_l, shape_l, cls_l, reg_l = [], [], [], []
        for f in feats:
            c = r = f if dt is None else f.astype(dt)
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            loc = loc_out(r).astype(jnp.float32)
            shape = shape_out(r).astype(jnp.float32)
            # adapt both towers with a DCN conditioned on the shape
            off = off_conv(jax.lax.stop_gradient(shape)).astype(jnp.float32)
            c32 = deform_conv2d(c.astype(jnp.float32), off,
                                adapt_w.astype(jnp.float32))
            r32 = deform_conv2d(r.astype(jnp.float32), off,
                                adapt_w.astype(jnp.float32))
            cls_l.append(cls_out(nn.relu(c32).astype(dt) if dt
                                 else nn.relu(c32)).astype(jnp.float32))
            reg_l.append(reg_out(nn.relu(r32).astype(dt) if dt
                                 else nn.relu(r32)).astype(jnp.float32))
            loc_l.append(loc)
            shape_l.append(shape)
        return tuple(cls_l), tuple(reg_l), tuple(shape_l), tuple(loc_l)


@DETECTORS.register
class GARetinaNet(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: float = 4.0
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    center_frac: float = 0.2
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = GuidedAnchorHead(num_classes=self.num_classes,
                                       dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _guided_anchors(self, shape_l):
        """Per-level predicted anchors (B, N, 4) + centers + strides."""
        B = shape_l[0].shape[0]
        anchors, centers, strides = [], [], []
        for li, sh in enumerate(shape_l):
            H, W = sh.shape[1:3]
            s = float(self.strides[li])
            base = self.octave_base_scale * s
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * s
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * s
            gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
            ctr = jnp.stack([gx, gy], -1).reshape(-1, 2)
            wh = jnp.exp(jnp.clip(sh, -4, 4)).reshape(B, -1, 2) * base
            a = jnp.stack([ctr[None, :, 0] - wh[..., 0] / 2,
                           ctr[None, :, 1] - wh[..., 1] / 2,
                           ctr[None, :, 0] + wh[..., 0] / 2,
                           ctr[None, :, 1] + wh[..., 1] / 2], -1)
            anchors.append(a)
            centers.append(ctr)
            strides.append(jnp.full((H * W,), s))
        return (jnp.concatenate(anchors, 1), jnp.concatenate(centers, 0),
                jnp.concatenate(strides, 0))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_l, reg_l, shape_l, loc_l = self(images, train=True)
        B = images.shape[0]
        anchors, centers, strides = self._guided_anchors(shape_l)
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_l], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in reg_l], 1)
        loc = jnp.concatenate([l.reshape(B, -1) for l in loc_l], 1)

        # ---- location targets: center region on the scale-matched level
        # ideal stride = sqrt(area) / octave_base_scale; round to a level
        glvl = jnp.clip(jnp.round(jnp.log2(jnp.sqrt(jnp.clip(
            (gt_boxes[..., 2] - gt_boxes[..., 0]) *
            (gt_boxes[..., 3] - gt_boxes[..., 1]), 1e-6))
            / self.octave_base_scale + 1e-6)),
            np.log2(self.strides[0]), np.log2(self.strides[-1]))
        plvl = jnp.log2(strides)                            # (N,)
        gc = jnp.stack([(gt_boxes[..., 0] + gt_boxes[..., 2]) / 2,
                        (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2], -1)
        half = jnp.stack([(gt_boxes[..., 2] - gt_boxes[..., 0]) / 2,
                          (gt_boxes[..., 3] - gt_boxes[..., 1]) / 2],
                         -1) * self.center_frac
        in_region = ((jnp.abs(centers[None, None, :, 0] -
                              gc[..., None, 0]) <= half[..., None, 0]) &
                     (jnp.abs(centers[None, None, :, 1] -
                              gc[..., None, 1]) <= half[..., None, 1]))
        lvl_ok = jnp.abs(plvl[None, None, :] - glvl[..., None]) < 0.5
        pos_loc = (in_region & lvl_ok &
                   gt_valid[..., None]).any(1)              # (B, N)
        n_loc = jnp.maximum(pos_loc.sum(), 1.0)
        loss_loc = losses.binary_cross_entropy(
            loc, pos_loc.astype(jnp.float32), avg_factor=n_loc)

        # ---- shape targets: best-IoU gt for in-region cells
        def single(anchors_i, gts, glabels, gvalid):
            ious = bbox_overlaps(gts, jax.lax.stop_gradient(anchors_i))
            assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.5,
                                         neg_iou_thr=0.4)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            tgt = gts[gidx]
            return pos, labels, tgt

        pos, labels, tgt = jax.vmap(single)(anchors, gt_boxes, gt_labels,
                                            gt_valid)
        tgt = jax.lax.stop_gradient(tgt)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        # shape loss: bounded IoU between guided wh and the matched gt wh
        pred_wh = jnp.stack([anchors[..., 2] - anchors[..., 0],
                             anchors[..., 3] - anchors[..., 1]], -1)
        tgt_wh = jnp.stack([tgt[..., 2] - tgt[..., 0],
                            tgt[..., 3] - tgt[..., 1]], -1)
        loss_shape = (bounded_iou_loss(pred_wh, tgt_wh) *
                      pos.astype(jnp.float32)).sum() / n_pos

        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_pos)
        enc = delta_encode(jax.lax.stop_gradient(anchors).reshape(-1, 4),
                           tgt.reshape(-1, 4),
                           stds=self.target_stds).reshape(B, -1, 4)
        loss_bbox = losses.smooth_l1_loss(
            reg, jax.lax.stop_gradient(enc),
            weight=pos[..., None].astype(jnp.float32), avg_factor=n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_shape": loss_shape, "loss_loc": loss_loc}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100, loc_thr=0.01) -> DetResult:
        cls_l, reg_l, shape_l, loc_l = self(images, train=False)
        B = images.shape[0]
        anchors, _, _ = self._guided_anchors(shape_l)
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_l], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in reg_l], 1)
        loc = jax.nn.sigmoid(jnp.concatenate(
            [l.reshape(B, -1) for l in loc_l], 1))
        prob = jax.nn.sigmoid(cls) * (loc > loc_thr)[..., None]
        boxes = delta_decode(anchors.reshape(-1, 4),
                             reg.reshape(-1, 4),
                             stds=self.target_stds).reshape(B, -1, 4)
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


def _ga_rpn_losses_and_proposals(det, images, img_shapes, gt_boxes, gt_valid,
                                 train, nms_pre, max_per_img, iou_thr,
                                 loc_thr=0.01):
    """Shared GA-RPN piece for GAFasterRCNN / GARPN: class-agnostic guided
    anchoring losses (train) + proposal generation.  Returns
    (feats, losses_dict_or_None, proposals (B, P, 4), prop_mask (B, P))."""
    feats = det.neck_m(det.backbone_m(images, train=train))
    cls_l, reg_l, shape_l, loc_l = det.ga_head(feats)
    B = images.shape[0]
    anchors, centers, strides = _guided_anchor_grid(
        shape_l, det.strides, det.octave_base_scale)
    cls = jnp.concatenate([c.reshape(B, -1, 1) for c in cls_l], 1)[..., 0]
    reg = jnp.concatenate([r.reshape(B, -1, 4) for r in reg_l], 1)
    loc = jnp.concatenate([l.reshape(B, -1) for l in loc_l], 1)

    out = None
    if train:
        out = {}
        glvl = jnp.clip(jnp.round(jnp.log2(jnp.sqrt(jnp.clip(
            (gt_boxes[..., 2] - gt_boxes[..., 0]) *
            (gt_boxes[..., 3] - gt_boxes[..., 1]), 1e-6))
            / det.octave_base_scale + 1e-6)),
            np.log2(det.strides[0]), np.log2(det.strides[-1]))
        plvl = jnp.log2(strides)
        gc = jnp.stack([(gt_boxes[..., 0] + gt_boxes[..., 2]) / 2,
                        (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2], -1)
        half = jnp.stack([(gt_boxes[..., 2] - gt_boxes[..., 0]) / 2,
                          (gt_boxes[..., 3] - gt_boxes[..., 1]) / 2],
                         -1) * det.center_frac
        in_region = ((jnp.abs(centers[None, None, :, 0] -
                              gc[..., None, 0]) <= half[..., None, 0]) &
                     (jnp.abs(centers[None, None, :, 1] -
                              gc[..., None, 1]) <= half[..., None, 1]))
        lvl_ok = jnp.abs(plvl[None, None, :] - glvl[..., None]) < 0.5
        pos_loc = (in_region & lvl_ok & gt_valid[..., None]).any(1)
        n_loc = jnp.maximum(pos_loc.sum(), 1.0)
        out["loss_rpn_loc"] = losses.binary_cross_entropy(
            loc, pos_loc.astype(jnp.float32), avg_factor=n_loc)

        def single(anchors_i, gts, gvalid):
            ious = bbox_overlaps(gts, jax.lax.stop_gradient(anchors_i))
            assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.7,
                                         neg_iou_thr=0.3, min_pos_iou=0.3,
                                         match_low_quality=True)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            return pos, (assigned >= 0), gts[gidx]

        pos, known, tgt = jax.vmap(single)(anchors, gt_boxes, gt_valid)
        tgt = jax.lax.stop_gradient(tgt)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        pred_wh = jnp.stack([anchors[..., 2] - anchors[..., 0],
                             anchors[..., 3] - anchors[..., 1]], -1)
        tgt_wh = jnp.stack([tgt[..., 2] - tgt[..., 0],
                            tgt[..., 3] - tgt[..., 1]], -1)
        out["loss_rpn_shape"] = (bounded_iou_loss(pred_wh, tgt_wh) *
                                 pos.astype(jnp.float32)).sum() / n_pos
        out["loss_rpn_cls"] = losses.binary_cross_entropy(
            cls, pos.astype(jnp.float32),
            weight=known.astype(jnp.float32),
            avg_factor=jnp.maximum(known.sum(), 1.0))
        enc = delta_encode(jax.lax.stop_gradient(anchors).reshape(-1, 4),
                           tgt.reshape(-1, 4),
                           stds=det.rpn_target_stds).reshape(B, -1, 4)
        out["loss_rpn_bbox"] = losses.smooth_l1_loss(
            reg, jax.lax.stop_gradient(enc),
            weight=pos[..., None].astype(jnp.float32), avg_factor=n_pos)

    # proposals: objectness gated by the location mask
    locp = jax.nn.sigmoid(loc)
    prob = jax.nn.sigmoid(cls) * (locp > loc_thr)
    boxes = delta_decode(anchors.reshape(-1, 4), reg.reshape(-1, 4),
                         stds=det.rpn_target_stds).reshape(B, -1, 4)
    h = img_shapes[:, 0][:, None, None]
    w = img_shapes[:, 1][:, None, None]
    x = jnp.clip(boxes[..., 0::2], 0, w)
    y = jnp.clip(boxes[..., 1::2], 0, h)
    boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
    k = min(nms_pre, prob.shape[1])
    top_s, top_i = jax.lax.top_k(prob, k)
    bx = jnp.take_along_axis(boxes, top_i[..., None].repeat(4, -1), 1)

    def one(b, s):
        r = batched_nms(b, s, jnp.zeros(s.shape, jnp.int32), iou_thr,
                        max_per_img, s > 0)
        return r.boxes, r.scores, r.mask

    pb, ps, pm = jax.vmap(one)(jax.lax.stop_gradient(bx),
                               jax.lax.stop_gradient(top_s))
    return feats, out, pb, ps, pm


def _guided_anchor_grid(shape_l, strides_cfg, octave_base_scale):
    """Per-level predicted anchors (B, N, 4) + centers + strides (shared by
    GARetinaNet._guided_anchors and the GA-RPN detectors)."""
    B = shape_l[0].shape[0]
    anchors, centers, strides = [], [], []
    for li, sh in enumerate(shape_l):
        H, W = sh.shape[1:3]
        s = float(strides_cfg[li])
        base = octave_base_scale * s
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * s
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * s
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        ctr = jnp.stack([gx, gy], -1).reshape(-1, 2)
        wh = jnp.exp(jnp.clip(sh, -4, 4)).reshape(B, -1, 2) * base
        a = jnp.stack([ctr[None, :, 0] - wh[..., 0] / 2,
                       ctr[None, :, 1] - wh[..., 1] / 2,
                       ctr[None, :, 0] + wh[..., 0] / 2,
                       ctr[None, :, 1] + wh[..., 1] / 2], -1)
        anchors.append(a)
        centers.append(ctr)
        strides.append(jnp.full((H * W,), s))
    return (jnp.concatenate(anchors, 1), jnp.concatenate(centers, 0),
            jnp.concatenate(strides, 0))


@DETECTORS.register
class GAFasterRCNN(nn.Module):
    """Faster R-CNN whose proposal stage is a class-agnostic guided-anchor
    head (`configs/guided_anchoring/ga_faster_*`): predicted anchor shapes
    + location gating + DCN feature adaptation feed the standard RCNN."""
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    octave_base_scale: float = 8.0
    center_frac: float = 0.2
    rpn_target_stds: Tuple[float, ...] = (0.07, 0.07, 0.14, 0.14)
    rcnn_target_stds: Tuple[float, ...] = (0.05, 0.05, 0.1, 0.1)
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None

    def setup(self):
        from .detectors import default_train_cfg, default_test_cfg  # noqa: F401
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (256, 512, 1024, 2048),
            "out_channels": 256, "num_outs": 5})
        self.neck_m = build(NECKS, neck_cfg)
        self.ga_head = GuidedAnchorHead(num_classes=1,
                                        dtype=self.compute_dtype)
        from .roi_head import Shared2FCBBoxHead
        self.bbox_head_m = Shared2FCBBoxHead(num_classes=self.num_classes,
                                             dtype=self.compute_dtype)

    def _roi_extract(self, feats, flat_rois, out_size: int = 7):
        from .roi_head import multilevel_roi_align
        return multilevel_roi_align(feats[:4], flat_rois,
                                    strides=self.featmap_strides,
                                    out_size=out_size)

    def __call__(self, images, train: bool = False):
        B = images.shape[0]
        shapes = jnp.tile(jnp.asarray(
            [[images.shape[1], images.shape[2]]], jnp.float32), (B, 1))
        feats, _, pb, ps, pm = _ga_rpn_losses_and_proposals(
            self, images, shapes, None, None, False, 1000, 300, 0.7)
        rois = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(B, dtype=pb.dtype)[:, None, None],
                              pb.shape[:2] + (1,)), pb], -1)
        return self.bbox_head_m(self._roi_extract(
            feats, rois.reshape(-1, 5)))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None, pano_ratio_v=None):
        from .detectors import default_train_cfg
        from .roi_head import sample_rois_for_training, bbox_head_loss
        tc = self.train_cfg or default_train_cfg()
        feats, losses_out, pb, ps, pm = _ga_rpn_losses_and_proposals(
            self, images, img_shapes, gt_boxes, gt_valid, True,
            tc["rpn_proposal"]["nms_pre"], tc["rpn_proposal"]["max_per_img"],
            tc["rpn_proposal"]["iou_threshold"])
        rng = self.make_rng("sampler")
        samples = sample_rois_for_training(
            rng, pb, pm, gt_boxes, gt_labels, gt_valid, self.num_classes,
            target_stds=self.rcnn_target_stds, **tc["rcnn"])
        B, S, _ = samples.rois.shape
        cls, reg = self.bbox_head_m(self._roi_extract(
            feats, samples.rois.reshape(B * S, 5)))
        losses_out.update(bbox_head_loss(
            cls, reg, samples, self.num_classes,
            target_stds=self.rcnn_target_stds))
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        from .detectors import default_test_cfg
        from .roi_head import bbox_head_detections
        cfg = self.test_cfg or default_test_cfg()
        feats, _, pb, ps, pm = _ga_rpn_losses_and_proposals(
            self, images, img_shapes, None, None, False,
            cfg["rpn"]["nms_pre"], cfg["rpn"]["max_per_img"],
            cfg["rpn"]["iou_threshold"])
        B, P, _ = pb.shape
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], pb], axis=-1)
        cls, reg = self.bbox_head_m(self._roi_extract(
            feats, rois.reshape(B * P, 5)))
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, -1), rois, img_shapes,
            self.num_classes, target_stds=self.rcnn_target_stds,
            roi_mask=pm, scale_factors=scale_factors, **cfg["rcnn"])


@DETECTORS.register
class GARPN(nn.Module):
    """Proposal-only guided-anchor RPN
    (`configs/guided_anchoring/ga_rpn_*`): evaluated by proposal recall;
    simple_test returns the proposals as class-0 detections."""
    backbone: Any
    num_classes: int = 1
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    octave_base_scale: float = 8.0
    center_frac: float = 0.2
    rpn_target_stds: Tuple[float, ...] = (0.07, 0.07, 0.14, 0.14)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (256, 512, 1024, 2048),
            "out_channels": 256, "num_outs": 5})
        self.neck_m = build(NECKS, neck_cfg)
        self.ga_head = GuidedAnchorHead(num_classes=1,
                                        dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        return self.ga_head(self.neck_m(self.backbone_m(images, train=train)))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid):
        _, losses_out, _, _, _ = _ga_rpn_losses_and_proposals(
            self, images, img_shapes, gt_boxes, gt_valid, True, 2000, 1000,
            0.7)
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, max_per_img=1000, iou_threshold=0.7,
                    **_):
        _, _, pb, ps, pm = _ga_rpn_losses_and_proposals(
            self, images, img_shapes, None, None, False, nms_pre,
            max_per_img, iou_threshold)
        if scale_factors is not None:
            pb = pb / scale_factors[:, None, :]
        return DetResult(pb, jnp.where(pm, ps, NEG_INF),
                         jnp.where(pm, 0, -1), pm)
