"""ATSS detector (`mmdet/models/dense_heads/atss_head.py` + adaptive
assigner): Retina-style towers with ONE anchor per cell (octave base 8),
centerness branch, GIoU regression on adaptively-selected positives.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.anchors import AnchorGenerator
from ..core.assigner import atss_assign
from ..core.bbox import delta_encode, delta_decode
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


@HEADS.register
class ATSSHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
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
                          name="atss_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=dt, name="atss_reg")
        ctr_out = nn.Conv(1, (3, 3), padding=1, dtype=dt, name="atss_centerness")
        scales = self.param("scales", nn.initializers.ones, (len(feats),))
        cls_o, reg_o, ctr_o = [], [], []
        for li, f in enumerate(feats):
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            cls_o.append(cls_out(c).astype(jnp.float32))
            reg_o.append(reg_out(r).astype(jnp.float32) * scales[li])
            ctr_o.append(ctr_out(r).astype(jnp.float32))
        return tuple(cls_o), tuple(reg_o), tuple(ctr_o)


@DETECTORS.register
class ATSS(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    topk: int = 9
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = ATSSHead(num_classes=self.num_classes,
                               dtype=self.compute_dtype)
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _anchors(self, cls_scores):
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_gen.grid_anchors(sizes)
        slices, start = [], 0
        for a in per_level:
            slices.append((start, len(a)))
            start += len(a)
        return jnp.asarray(np.concatenate(per_level)), tuple(slices)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, centernesses = self(images, train=True)
        anchors, slices = self._anchors(cls_scores)
        B = images.shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        ctr = jnp.concatenate([c.reshape(B, -1) for c in centernesses], 1)

        def single(gts, glabels, gvalid):
            assigned = atss_assign(anchors, slices, gts, gvalid, self.topk)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            tgt = gts[gidx]
            # centerness target from anchor-center l/t/r/b inside the gt
            acx = (anchors[:, 0] + anchors[:, 2]) / 2
            acy = (anchors[:, 1] + anchors[:, 3]) / 2
            l = jnp.clip(acx - tgt[:, 0], 1e-6)
            t = jnp.clip(acy - tgt[:, 1], 1e-6)
            r = jnp.clip(tgt[:, 2] - acx, 1e-6)
            b = jnp.clip(tgt[:, 3] - acy, 1e-6)
            c = jnp.sqrt((jnp.minimum(l, r) / jnp.maximum(l, r)) *
                         (jnp.minimum(t, b) / jnp.maximum(t, b)))
            return labels, tgt, jnp.where(pos, c, 0.0), pos

        labels, tgt_boxes, ctr_t, pos = jax.vmap(single)(
            gt_boxes, gt_labels, gt_valid)
        tgt_boxes = jax.lax.stop_gradient(tgt_boxes)
        ctr_t = jax.lax.stop_gradient(ctr_t)
        n_pos = jnp.maximum(pos.sum(), 1.0)

        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_pos)
        pred_boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                                  stds=self.target_stds)
        w = pos.astype(jnp.float32) * ctr_t
        loss_bbox = losses.giou_loss(pred_boxes, tgt_boxes, weight=w,
                                     avg_factor=jnp.maximum(w.sum(), 1e-6))
        loss_ctr = losses.binary_cross_entropy(
            ctr, ctr_t, weight=pos.astype(jnp.float32), avg_factor=n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_centerness": loss_ctr}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds, centernesses = self(images, train=False)
        anchors, _ = self._anchors(cls_scores)
        B = images.shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        ctr = jnp.concatenate([c.reshape(B, -1) for c in centernesses], 1)
        prob = jax.nn.sigmoid(cls) * jax.nn.sigmoid(ctr)[..., None]
        boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                             stds=self.target_stds)
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
