"""SSD-300/512: VGG16 backbone with extra layers, multi-scale anchor head,
hard-negative mining (`mmdet/models/backbones/ssd_vgg.py` +
`dense_heads/ssd_head.py`, `anchor/anchor_generator.py SSDAnchorGenerator`).
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..core.assigner import max_iou_assign
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .registry import BACKBONES, DETECTORS, build

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "C",
             512, 512, 512, "M", 512, 512, 512)


@BACKBONES.register
class SSDVGG(nn.Module):
    """VGG-16 with dilated fc6/fc7 convs + extra layers; outputs 6 maps
    (conv4_3 with learned L2Norm, fc7, extra 1-4)."""
    input_size: int = 300

    @nn.compact
    def __call__(self, x, train=False):
        outs = []
        li = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif v == "C":
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding=((0, 1), (0, 1)))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=1, name=f"conv_{li}")(x))
                li += 1
            if li == 10 and v == 512:  # conv4_3
                scale = self.param("l2_norm_scale",
                                   nn.initializers.constant(20.0), (512,))
                n = x / jnp.maximum(
                    jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-10)
                outs.append(n * scale)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=6,
                            name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name="fc7")(x))
        outs.append(x)
        extra = ((256, 512, 2), (128, 256, 2), (128, 256, 1), (128, 256, 1))
        for i, (c1, c2, s) in enumerate(extra):
            x = nn.relu(nn.Conv(c1, (1, 1), name=f"extra_{i}_0")(x))
            pad = 1 if s == 2 else 0
            x = nn.relu(nn.Conv(c2, (3, 3), strides=(s, s), padding=pad,
                                name=f"extra_{i}_1")(x))
            outs.append(x)
        return tuple(outs)


def ssd_anchors(featmap_sizes, input_size=300):
    """SSD anchor boxes per level (SSDAnchorGenerator semantics):
    min/max sizes from the 0.15-0.9 scale rule, ratios (2,) or (2, 3)."""
    ratios_per = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    min_ratio, max_ratio = 0.15, 0.9
    step = (max_ratio - min_ratio) / (len(featmap_sizes) - 2)
    sizes = [0.07 * input_size]
    sizes += [(min_ratio + step * i) * input_size
              for i in range(len(featmap_sizes) - 1)]
    sizes.append(1.05 * input_size)
    out = []
    for li, (fh, fw) in enumerate(featmap_sizes):
        s = sizes[li]
        s_next = sizes[li + 1]
        stride_h = input_size / fh
        stride_w = input_size / fw
        whs = [(s, s), (np.sqrt(s * s_next), np.sqrt(s * s_next))]
        for r in ratios_per[li]:
            whs.append((s * np.sqrt(r), s / np.sqrt(r)))
            whs.append((s / np.sqrt(r), s * np.sqrt(r)))
        whs = np.asarray(whs, np.float32)
        cx = (np.arange(fw) + 0.5) * stride_w
        cy = (np.arange(fh) + 0.5) * stride_h
        cyy, cxx = np.meshgrid(cy, cx, indexing="ij")
        centers = np.stack([cxx, cyy], -1).reshape(-1, 1, 2)
        boxes = np.concatenate([centers - whs[None] / 2,
                                centers + whs[None] / 2], -1)
        out.append(boxes.reshape(-1, 4).astype(np.float32))
    return out


@DETECTORS.register
class SSD(nn.Module):
    backbone: Any
    num_classes: int = 80
    input_size: int = 300
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    neg_pos_ratio: int = 3
    # PISA (configs/pisa pisa_ssd*): ISR-P + CARL on the matched anchors
    pisa: Optional[dict] = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        n_anchors = (4, 6, 6, 6, 4, 4)
        self.cls_convs = [nn.Conv(a * (self.num_classes + 1), (3, 3),
                                  padding=1, name=f"cls_{i}")
                          for i, a in enumerate(n_anchors)]
        self.reg_convs = [nn.Conv(a * 4, (3, 3), padding=1, name=f"reg_{i}")
                          for i, a in enumerate(n_anchors)]

    def __call__(self, images, train: bool = False):
        feats = self.backbone_m(images, train=train)
        cls = [c(f) for c, f in zip(self.cls_convs, feats)]
        reg = [r(f) for r, f in zip(self.reg_convs, feats)]
        return tuple(cls), tuple(reg)

    def _flat(self, cls_scores, bbox_preds):
        B = cls_scores[0].shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes + 1) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        anchors = jnp.asarray(np.concatenate(ssd_anchors(
            [tuple(c.shape[1:3]) for c in cls_scores], self.input_size)))
        return cls, reg, anchors

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = self(images, train=True)
        cls, reg, anchors = self._flat(cls_scores, bbox_preds)
        B, N, _ = cls.shape

        def single(gts, glabels, gvalid):
            ious = bbox_overlaps(gts, anchors)
            assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.5,
                                         neg_iou_thr=0.5, min_pos_iou=0.0,
                                         match_low_quality=True)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            targets = jax.lax.stop_gradient(
                delta_encode(anchors, gts[gidx], stds=self.target_stds))
            miou = jnp.where(pos, jnp.where(gvalid[:, None], ious, -1).max(0),
                             0.0)
            return labels, targets, pos, miou

        labels, targets, pos, mious = jax.vmap(single)(
            gt_boxes, gt_labels, gt_valid)
        n_pos = jnp.maximum(pos.sum(), 1.0)

        # hard negative mining: keep the 3*n_pos highest-loss negatives
        logp = jax.nn.log_softmax(cls, -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        neg_loss = jnp.where(pos, -jnp.inf, nll).reshape(-1)
        k = int(self.neg_pos_ratio)
        n_neg_keep = jnp.minimum((k * pos.sum()).astype(jnp.int32),
                                 (~pos).sum().astype(jnp.int32))
        order = jnp.argsort(-neg_loss)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        neg_keep = (rank < n_neg_keep).reshape(B, N) & (~pos)

        w = (pos | neg_keep).astype(jnp.float32)
        loss_cls = (nll * w).sum() / n_pos
        reg_w = pos[..., None].astype(jnp.float32)
        out_extra = {}
        if self.pisa:
            pflat = pos.reshape(-1).astype(jnp.float32)
            isr = losses.isr_weights(
                mious.reshape(-1), pflat, k=self.pisa.get("isr_k", 2.0),
                bias=self.pisa.get("isr_bias", 0.0)).reshape(pos.shape)
            reg_w = reg_w * isr[..., None]
            carl = losses.carl_weights(
                cls.reshape(-1, cls.shape[-1]), labels.reshape(-1), pflat,
                self.num_classes, k=self.pisa.get("carl_k", 1.0),
                bias=self.pisa.get("carl_bias", 0.2))
            out_extra["loss_carl"] = losses.smooth_l1_loss(
                reg, targets, beta=1.0,
                weight=carl.reshape(pos.shape)[..., None],
                avg_factor=n_pos) * self.pisa.get("carl_weight", 1.0)
        loss_bbox = losses.smooth_l1_loss(
            reg, targets, beta=1.0, weight=reg_w,
            avg_factor=n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, **out_extra}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, score_thr=0.02, iou_threshold=0.45,
                    max_per_img=200) -> DetResult:
        cls_scores, bbox_preds = self(images, train=False)
        cls, reg, anchors = self._flat(cls_scores, bbox_preds)
        B = cls.shape[0]
        prob = jax.nn.softmax(cls, -1)[..., :self.num_classes]
        boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                             stds=self.target_stds)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        flat = prob.reshape(B, -1)
        k = min(1000, flat.shape[1])
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
