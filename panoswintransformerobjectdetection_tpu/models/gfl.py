"""GFL detector (`mmdet/models/dense_heads/gfl_head.py`): ATSS-style towers
where box regression is a learned discrete distribution over the integral set
{0..reg_max} per side (ltrb, in stride units).  Classification is trained
with quality focal loss against the decoded box's IoU; regression with
distribution focal loss + GIoU.  Assignment is ATSS.

TPU notes: the integral is one softmax+dot (fused by XLA); targets are
fixed-shape with validity masks like every other head here.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.anchors import AnchorGenerator
from ..core.assigner import atss_assign
from ..core.bbox import bbox_overlaps
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


def integral(reg_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) distribution logits -> (..., 4) expected
    distances (`gfl_head.py` Integral module)."""
    shape = reg_logits.shape[:-1]
    p = jax.nn.softmax(reg_logits.reshape(*shape, 4, reg_max + 1), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return (p * proj).sum(-1)


def distance2bbox(centers: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """centers (..., 2) + ltrb distances (..., 4) -> xyxy boxes."""
    return jnp.stack([centers[..., 0] - dist[..., 0],
                      centers[..., 1] - dist[..., 1],
                      centers[..., 0] + dist[..., 2],
                      centers[..., 1] + dist[..., 3]], -1)


def bbox2distance(centers: jnp.ndarray, boxes: jnp.ndarray,
                  reg_max: int) -> jnp.ndarray:
    """Inverse of distance2bbox, clipped into the integral range."""
    d = jnp.stack([centers[..., 0] - boxes[..., 0],
                   centers[..., 1] - boxes[..., 1],
                   boxes[..., 2] - centers[..., 0],
                   boxes[..., 3] - centers[..., 1]], -1)
    return jnp.clip(d, 0, reg_max - 0.1)


@HEADS.register
class GFLHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        dt = resolve_dtype(self.dtype)
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"reg_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="gfl_cls")
        reg_out = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding=1,
                          dtype=dt, name="gfl_reg")
        scales = self.param("scales", nn.initializers.ones, (len(feats),))
        cls_o, reg_o = [], []
        for li, f in enumerate(feats):
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            cls_o.append(cls_out(c).astype(jnp.float32))
            reg_o.append(reg_out(r).astype(jnp.float32) * scales[li])
        return tuple(cls_o), tuple(reg_o)


@DETECTORS.register
class GFL(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    reg_max: int = 16
    topk: int = 9
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = GFLHead(num_classes=self.num_classes,
                              reg_max=self.reg_max, dtype=self.compute_dtype)
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _flatten(self, cls_scores, reg_logits):
        """Concat levels; also return anchor centers, per-anchor strides,
        level slices."""
        B = cls_scores[0].shape[0]
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_gen.grid_anchors(sizes)
        slices, start = [], 0
        strides = []
        for a, s in zip(per_level, self.anchor_strides):
            slices.append((start, len(a)))
            start += len(a)
            strides.append(np.full(len(a), s, np.float32))
        anchors = jnp.asarray(np.concatenate(per_level))
        stride = jnp.asarray(np.concatenate(strides))
        centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                             (anchors[:, 1] + anchors[:, 3]) / 2], -1)
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate(
            [r.reshape(B, -1, 4 * (self.reg_max + 1)) for r in reg_logits], 1)
        return cls, reg, anchors, centers, stride, tuple(slices)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, reg_logits = self(images, train=True)
        cls, reg, anchors, centers, stride, slices = self._flatten(
            cls_scores, reg_logits)
        out = self._losses_from_flat(cls, reg, anchors, centers, stride,
                                     slices, gt_boxes, gt_labels, gt_valid)
        out.pop("_pos_weight")
        return out

    def _losses_from_flat(self, cls, reg, anchors, centers, stride, slices,
                          gt_boxes, gt_labels,
                          gt_valid) -> Dict[str, jnp.ndarray]:
        dist = integral(reg, self.reg_max)                     # stride units
        boxes = distance2bbox(centers[None] / stride[None, :, None],
                              dist) * stride[None, :, None]

        def single(pred_boxes, gts, glabels, gvalid):
            assigned = atss_assign(anchors, slices, gts, gvalid, self.topk)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            tgt = gts[gidx]
            iou = jax.vmap(lambda p, t: bbox_overlaps(p[None], t[None])[0, 0])(
                pred_boxes, tgt)
            score = jnp.where(pos, iou, 0.0)
            tgt_dist = bbox2distance(centers / stride[:, None],
                                     tgt / stride[:, None], self.reg_max)
            return labels, tgt, tgt_dist, score, pos

        labels, tgt_boxes, tgt_dist, score, pos = jax.vmap(
            single, in_axes=(0, 0, 0, 0))(boxes, gt_boxes, gt_labels, gt_valid)
        tgt_boxes = jax.lax.stop_gradient(tgt_boxes)
        tgt_dist = jax.lax.stop_gradient(tgt_dist)
        score = jax.lax.stop_gradient(score)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        # reweight box losses by detached predicted quality (gfl_head.py
        # weight_targets = cls sigmoid max on positives)
        wq = jnp.where(pos, jax.lax.stop_gradient(
            jax.nn.sigmoid(cls).max(-1)), 0.0)
        wsum = jnp.maximum(wq.sum(), 1e-6)

        loss_cls = losses.quality_focal_loss(
            cls, labels, score, self.num_classes, avg_factor=n_pos)
        # loss_weight=2.0 on GIoU per gfl_r50_fpn_1x_coco.py
        loss_bbox = 2.0 * losses.giou_loss(boxes, tgt_boxes, weight=wq,
                                           avg_factor=wsum)
        B = cls.shape[0]
        loss_dfl = losses.distribution_focal_loss(
            reg.reshape(B, -1, 4, self.reg_max + 1), tgt_dist,
            weight=wq[..., None] / 4.0, avg_factor=wsum)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_dfl": loss_dfl, "_pos_weight": wq}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
                    max_per_img=100) -> DetResult:
        cls_scores, reg_logits = self(images, train=False)
        cls, reg, _, centers, stride, _ = self._flatten(cls_scores, reg_logits)
        B = images.shape[0]
        dist = integral(reg, self.reg_max)
        boxes = distance2bbox(centers[None] / stride[None, :, None],
                              dist) * stride[None, :, None]
        prob = jax.nn.sigmoid(cls)
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


@DETECTORS.register
class LDGFL(GFL):
    """Localization Distillation (`mmdet/models/dense_heads/ld_head.py` +
    `detectors/kd_one_stage.py`): a GFL student whose box distributions are
    additionally distilled from a frozen teacher's via temperature-10 KL on
    positive anchors.  The teacher's flattened reg logits are an input to
    `forward_train_kd` (computed with the frozen teacher params outside the
    student's grad, e.g. `teacher.apply` + `_flatten` under stop_gradient —
    the reference equally runs the teacher in `torch.no_grad`)."""

    kd_T: float = 10.0

    def forward_train_kd(self, images, img_shapes, gt_boxes, gt_labels,
                         gt_valid, teacher_reg) -> Dict[str, jnp.ndarray]:
        """teacher_reg: (B, N, 4*(reg_max+1)) flattened teacher distribution
        logits over the same anchor layout."""
        cls_scores, reg_logits = self(images, train=True)
        cls, reg, anchors, centers, stride, slices = self._flatten(
            cls_scores, reg_logits)
        out = self._losses_from_flat(cls, reg, anchors, centers, stride,
                                     slices, gt_boxes, gt_labels, gt_valid)
        pos_w = out.pop("_pos_weight")
        B = cls.shape[0]
        out["loss_ld"] = 0.25 * losses.kd_kl_div_loss(
            reg.reshape(B, -1, 4, self.reg_max + 1),
            teacher_reg.reshape(B, -1, 4, self.reg_max + 1), T=self.kd_T,
            weight=pos_w[..., None] / 4.0,
            avg_factor=jnp.maximum(pos_w.sum(), 1e-6))
        return out
