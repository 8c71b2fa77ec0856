"""YOLACT (`mmdet/models/dense_heads/yolact_head.py` +
`detectors/yolact.py`): real-time instance segmentation — a protonet on P3
emits k=32 mask prototypes at stride 4; each anchor predicts box deltas,
softmax class scores and k tanh coefficients; instance masks are
sigmoid(protos @ coeffs) cropped to the box.  An auxiliary per-class
semantic head supervises P3.

Fixed-shape mask training: instead of the reference's dynamic
`max_masks_to_train=100` subsample, the `mask_train_cap` highest-IoU
positive anchors are selected with a masked top-k.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.anchors import AnchorGenerator
from ..core.assigner import max_iou_assign
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .fpn import nearest_upsample
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build

NUM_PROTOS = 32


@HEADS.register
class ProtoNet(nn.Module):
    """`YOLACTProtonet._init_layers`: 3x conv256 -> x2 upsample -> conv256
    -> 1x1 conv to k prototypes, ReLU throughout."""
    num_protos: int = NUM_PROTOS

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1,
                                name=f"proto{i}")(x))
        B, H, W, C = x.shape
        x = nearest_upsample(x, H * 2, W * 2)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="proto3")(x))
        return nn.relu(nn.Conv(self.num_protos, (1, 1), name="proto_out")(x))


@HEADS.register
class YOLACTPredHead(nn.Module):
    """Shared tower + per-anchor cls (softmax C+1), box, tanh coeff heads."""
    num_classes: int = 80
    num_anchors: int = 3
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        shared = nn.Conv(self.feat_channels, (3, 3), padding=1,
                         name="head_conv")
        cls_out = nn.Conv(self.num_anchors * (self.num_classes + 1), (3, 3),
                          padding=1, name="conv_cls")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                          name="conv_reg")
        coef_out = nn.Conv(self.num_anchors * NUM_PROTOS, (3, 3), padding=1,
                           name="conv_coeff")
        cls_l, reg_l, coef_l = [], [], []
        for f in feats:
            x = nn.relu(shared(f))
            cls_l.append(cls_out(x))
            reg_l.append(reg_out(x))
            coef_l.append(jnp.tanh(coef_out(x)))
        return tuple(cls_l), tuple(reg_l), tuple(coef_l)


def crop_mask(mask: jnp.ndarray, box: jnp.ndarray, scale: float):
    """Zero a (Hp, Wp) mask outside `box` (xyxy image coords) given the
    proto stride (`yolact_head.py crop` role)."""
    Hp, Wp = mask.shape
    xs = (jnp.arange(Wp, dtype=jnp.float32) + 0.5) * scale
    ys = (jnp.arange(Hp, dtype=jnp.float32) + 0.5) * scale
    inside = ((xs[None, :] >= box[0]) & (xs[None, :] <= box[2]) &
              (ys[:, None] >= box[1]) & (ys[:, None] <= box[3]))
    return mask * inside


@DETECTORS.register
class YOLACT(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    proto_stride: int = 4
    mask_train_cap: int = 100
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = YOLACTPredHead(num_classes=self.num_classes)
        self.proto_m = ProtoNet()
        self.segm_conv = nn.Conv(self.num_classes, (1, 1), name="segm_conv")
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(0.5, 1.0, 2.0),
            octave_base_scale=3, scales_per_octave=1)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        cls_l, reg_l, coef_l = self.head_m(feats)
        protos = self.proto_m(feats[0])
        segm = self.segm_conv(feats[0])
        return cls_l, reg_l, coef_l, protos, segm

    def _flat(self, cls_l, reg_l, coef_l):
        B = cls_l[0].shape[0]
        sizes = [tuple(c.shape[1:3]) for c in cls_l]
        anchors = jnp.asarray(np.concatenate(
            self.anchor_gen.grid_anchors(sizes)))
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes + 1) for c in cls_l], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in reg_l], 1)
        coef = jnp.concatenate(
            [c.reshape(B, -1, NUM_PROTOS) for c in coef_l], 1)
        return cls, reg, coef, anchors

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None) -> Dict[str, jnp.ndarray]:
        cls_l, reg_l, coef_l, protos, segm = self(images, train=True)
        cls, reg, coef, anchors = self._flat(cls_l, reg_l, coef_l)
        B, N = cls.shape[:2]
        Hp, Wp = protos.shape[1:3]
        K = self.mask_train_cap

        def single(gts, glabels, gvalid):
            ious = bbox_overlaps(gts, anchors)
            assigned, max_iou = max_iou_assign(ious, gvalid,
                                               pos_iou_thr=0.5,
                                               neg_iou_thr=0.4)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            # background = class 0 in the softmax head, fg shifted by +1
            labels = jnp.where(pos, glabels[gidx] + 1, 0)
            tgt = delta_encode(anchors, gts[gidx], stds=self.target_stds)
            # cap mask training to the top-K IoU positives
            sel_score = jnp.where(pos, max_iou, -1.0)
            _, sel = jax.lax.top_k(sel_score, K)
            sel_valid = jnp.take_along_axis(pos, sel, 0)
            return pos, labels, tgt, gidx, sel, sel_valid

        pos, labels, tgt, gidx, sel, sel_valid = jax.vmap(single)(
            gt_boxes, gt_labels, gt_valid)
        tgt = jax.lax.stop_gradient(tgt)
        n_pos = jnp.maximum(pos.sum(), 1.0)

        # OHEM cls (3:1 like SSD): hardest negatives by loss
        logp = jax.nn.log_softmax(cls, -1)
        per = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        neg_loss = jnp.where(pos, -jnp.inf, per)
        k_neg = min(N, 3 * int(self.mask_train_cap))
        top_neg, _ = jax.lax.top_k(neg_loss, k_neg)
        quota = jnp.minimum(3.0 * pos.sum(1, keepdims=True),
                            jnp.float32(k_neg))
        rank = jnp.arange(k_neg, dtype=jnp.float32)[None]
        neg_sel = (rank < quota) & jnp.isfinite(top_neg)
        loss_cls = ((per * pos).sum()
                    + jnp.where(neg_sel, top_neg, 0.0).sum()) / n_pos
        loss_bbox = losses.smooth_l1_loss(
            reg, tgt, beta=1.0,
            weight=pos[..., None].astype(jnp.float32), avg_factor=n_pos)

        out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox}
        if gt_masks is not None:
            gm = gt_masks.astype(jnp.float32)
            # downsample gt bitmaps to proto resolution (stride 4 mean-pool)
            s = self.proto_stride
            Hm = gm.shape[2] // s
            Wm = gm.shape[3] // s
            gm_small = gm[:, :, :Hm * s, :Wm * s].reshape(
                B, -1, Hm, s, Wm, s).mean((3, 5))

            def mask_loss_one(protos_i, coef_i, sel_i, selv_i, gidx_i,
                              gts_i, gm_i):
                c = coef_i[sel_i]                          # (K, P)
                m = jax.nn.sigmoid(
                    jnp.einsum("hwp,kp->khw", protos_i, c))
                g = gidx_i[sel_i]
                tgt_m = gm_i[g][:, :Hp, :Wp]
                boxes = gts_i[g]
                m = jax.vmap(lambda mm, bb: crop_mask(
                    mm, bb, float(self.proto_stride)))(m, boxes)
                bce = -(tgt_m * jnp.log(jnp.clip(m, 1e-6))
                        + (1 - tgt_m) * jnp.log(jnp.clip(1 - m, 1e-6)))
                area = jnp.clip((boxes[:, 2] - boxes[:, 0]) *
                                (boxes[:, 3] - boxes[:, 1]), 1.0)
                per_m = bce.sum((1, 2)) * (self.proto_stride ** 2) / area
                return (per_m * selv_i).sum(), selv_i.sum()

            ml, mn = jax.vmap(mask_loss_one)(
                protos, coef, sel, sel_valid.astype(jnp.float32), gidx,
                gt_boxes, gm_small)
            out["loss_mask"] = ml.sum() / jnp.maximum(mn.sum(), 1.0)
            # semantic head: per-class max of downsampled gt masks at P3 res
            Hs, Ws = segm.shape[1:3]
            s8 = gm.shape[2] // Hs

            def seg_tgt_one(gm_i, glabels, gvalid):
                small = gm_i[:, :Hs * s8, :Ws * s8].reshape(
                    -1, Hs, s8, Ws, s8).max((2, 4))
                seg = jax.ops.segment_max(
                    jnp.where(gvalid[:, None, None], small, 0.0),
                    jnp.clip(glabels, 0, self.num_classes - 1),
                    num_segments=self.num_classes)
                return jnp.maximum(seg, 0.0).transpose(1, 2, 0)

            seg_t = jax.lax.stop_gradient(jax.vmap(seg_tgt_one)(
                gm, gt_labels, gt_valid))
            out["loss_segm"] = losses.binary_cross_entropy(
                segm, seg_t, avg_factor=B * Hs * Ws)
        return out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100, nms_type="fast", fast_nms_top_k=200):
        """Returns (DetResult, masks (B, K, Hp, Wp) probabilities at proto
        resolution, cropped to the detected boxes).

        nms_type "fast" (default) = YOLACT Fast NMS
        (`yolact.py simple_test` -> `fast_nms`, the reference's test path);
        "batched" = exact greedy class-wise NMS."""
        cls_l, reg_l, coef_l, protos, _ = self(images, train=False)
        cls, reg, coef, anchors = self._flat(cls_l, reg_l, coef_l)
        B = cls.shape[0]
        prob = jax.nn.softmax(cls, -1)[..., 1:]            # drop background
        boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                             stds=self.target_stds)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)

        if nms_type == "fast":
            from ..ops.nms import fast_nms

            def one_fast(b, p, c, proto):
                det, ck = fast_nms(b, p, iou_threshold, max_per_img,
                                   top_k=fast_nms_top_k,
                                   score_thr=score_thr, coeffs=c)
                m = jax.nn.sigmoid(jnp.einsum("hwp,kp->khw", proto, ck))
                m = jax.vmap(lambda mm, bb: crop_mask(
                    mm, bb, float(self.proto_stride)))(m, det.boxes)
                return det, m

            dets, masks = jax.vmap(one_fast)(boxes, prob, coef, protos)
            if scale_factors is not None:
                dets = DetResult(dets.boxes / scale_factors[:, None, :],
                                 dets.scores, dets.labels, dets.mask)
            return dets, masks

        flat = prob.reshape(B, -1)
        k = min(nms_pre, flat.shape[1])
        top_s, top_i = jax.lax.top_k(flat, k)
        ai = top_i // self.num_classes
        li = (top_i % self.num_classes).astype(jnp.int32)
        bx = jnp.take_along_axis(boxes, ai[..., None].repeat(4, -1), 1)
        cf = jnp.take_along_axis(coef, ai[..., None].repeat(NUM_PROTOS, -1),
                                 1)
        valid = top_s > score_thr

        def one(b, s, l, v, c, proto):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            ck = c[r.idx]                                  # (K, P)
            m = jax.nn.sigmoid(jnp.einsum("hwp,kp->khw", proto, ck))
            m = jax.vmap(lambda mm, bb: crop_mask(
                mm, bb, float(self.proto_stride)))(m, r.boxes)
            return (DetResult(r.boxes,
                              jnp.where(r.mask, r.scores, NEG_INF),
                              jnp.where(r.mask, lab, -1), r.mask), m)

        dets, masks = jax.vmap(one)(bx, top_s, li, valid, cf, protos)
        if scale_factors is not None:
            dets = DetResult(dets.boxes / scale_factors[:, None, :],
                             dets.scores, dets.labels, dets.mask)
        return dets, masks
