"""FSAF detector (`mmdet/models/dense_heads/fsaf_head.py` +
`detectors/fsaf.py`): anchor-free RetinaNet branch with ONLINE feature
selection — each gt is routed to the pyramid level where its current
(cls + box) loss over the effective center region is smallest, recomputed
every step from the live predictions.

Fixed-shape formulation: per (gt, level) masked mean losses -> argmin over
levels -> per-level targets where effective-region pixels of the gts that
chose the level are positive (smallest-area gt wins overlaps) and the wider
ignore region is zero-weighted.  The reference's adjacent-level ignore is
approximated by ignoring every level's own ignore region (documented
deviation; it only affects gradient masking of near-boundary negatives).
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build

EPS = 1e-6


@HEADS.register
class FSAFHead(nn.Module):
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
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="fsaf_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=dt, name="fsaf_reg")
        cls_o, reg_o = [], []
        for f in feats:
            c = r = f if dt is None else f.astype(dt)
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_o.append(cls_out(c).astype(jnp.float32))
            # ltrb distances are positive: relu + eps (fsaf_head.py
            # forward_single applies self.relu to the reg output)
            reg_o.append(nn.relu(reg_out(r).astype(jnp.float32)) + EPS)
        return tuple(cls_o), tuple(reg_o)


def _region_mask(gts, gvalid, H, W, stride, frac):
    """(G, H, W) bool: pixel centers inside the `frac`-shrunk gt region."""
    g = gts / stride
    cx = (g[:, 0] + g[:, 2]) / 2
    cy = (g[:, 1] + g[:, 3]) / 2
    hw = (g[:, 2] - g[:, 0]) / 2 * frac
    hh = (g[:, 3] - g[:, 1]) / 2 * frac
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    inx = (xs[None, None, :] >= (cx - hw)[:, None, None]) & \
          (xs[None, None, :] <= (cx + hw)[:, None, None])
    iny = (ys[None, :, None] >= (cy - hh)[:, None, None]) & \
          (ys[None, :, None] <= (cy + hh)[:, None, None])
    return inx & iny & gvalid[:, None, None]


def _decode_tblr(reg, stride):
    """reg (H, W, 4) positive ltrb in stride*4 units -> xyxy image boxes."""
    H, W = reg.shape[:2]
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * stride
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * stride
    px = xs[None, :]
    py = ys[:, None]
    s4 = 4.0 * stride
    return jnp.stack([px - reg[..., 0] * s4, py - reg[..., 1] * s4,
                      px + reg[..., 2] * s4, py + reg[..., 3] * s4], -1)


def _iou_loss_map(boxes, gt):
    """-log IoU of every pixel's decoded box vs one gt box. boxes (H,W,4)."""
    lt = jnp.maximum(boxes[..., :2], gt[:2])
    rb = jnp.minimum(boxes[..., 2:], gt[2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.clip((boxes[..., 2] - boxes[..., 0]) *
                  (boxes[..., 3] - boxes[..., 1]), 0)
    a2 = jnp.clip((gt[2] - gt[0]) * (gt[3] - gt[1]), 0)
    iou = inter / jnp.maximum(a1 + a2 - inter, EPS)
    return -jnp.log(jnp.clip(iou, EPS, 1.0))


@DETECTORS.register
class FSAF(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    effective_frac: float = 0.2
    ignore_frac: float = 0.5
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = FSAFHead(num_classes=self.num_classes,
                               dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = self(images, train=True)
        B = images.shape[0]
        G = gt_boxes.shape[1]
        L = len(cls_scores)

        # ---- online feature selection: per (image, gt, level) mean loss
        sel_losses = []
        for li, (cs, bp) in enumerate(zip(cls_scores, bbox_preds)):
            H, W = cs.shape[1:3]
            s = float(self.strides[li])

            def per_image(cs_i, bp_i, gts, glabels, gvalid):
                eff = _region_mask(gts, gvalid, H, W, s, self.effective_frac)
                area = jnp.maximum(eff.sum((1, 2)).astype(jnp.float32), 1.0)
                boxes = _decode_tblr(bp_i, s)

                def per_gt(gt, glabel, m, a):
                    reg_l = (_iou_loss_map(boxes, gt) * m).sum() / a
                    p = jax.nn.sigmoid(cs_i[..., glabel])
                    cls_l = (-jnp.log(jnp.clip(p, EPS)) *
                             (1 - p) ** 2 * 0.25 * m).sum() / a
                    # a level whose projected region is empty must not win
                    return jnp.where(m.sum() > 0, cls_l + reg_l, jnp.inf)

                return jax.vmap(per_gt)(gts, glabels,
                                        eff.astype(jnp.float32), area)

            sel_losses.append(jax.vmap(per_image)(
                cs, bp, gt_boxes, gt_labels, gt_valid))   # (B, G)
        sel = jnp.stack(sel_losses, -1)                    # (B, G, L)
        level_sel = jax.lax.stop_gradient(sel.argmin(-1))  # (B, G)

        # ---- per-level targets with the selected routing
        total_cls, total_reg = 0.0, 0.0
        n_pos_all = 0.0
        for li, (cs, bp) in enumerate(zip(cls_scores, bbox_preds)):
            H, W = cs.shape[1:3]
            s = float(self.strides[li])

            def level_targets(gts, glabels, gvalid, lsel):
                pick = gvalid & (lsel == li)
                eff = _region_mask(gts, pick, H, W, s, self.effective_frac)
                ign = _region_mask(gts, pick, H, W, s, self.ignore_frac)
                ar = jnp.clip((gts[:, 2] - gts[:, 0]) *
                              (gts[:, 3] - gts[:, 1]), 0)
                key = jnp.where(eff, ar[:, None, None], jnp.inf)
                winner = key.argmin(0)
                pos = jnp.isfinite(key.min(0))
                labels = jnp.where(pos, glabels[winner], self.num_classes)
                tgt = gts[winner]
                ignore = ign.any(0) & ~pos
                return labels, tgt, pos, ignore

            labels, tgt, pos, ignore = jax.vmap(level_targets)(
                gt_boxes, gt_labels, gt_valid, level_sel)
            tgt = jax.lax.stop_gradient(tgt)
            boxes = jax.vmap(lambda r: _decode_tblr(r, s))(bp)
            n_pos = pos.sum().astype(jnp.float32)
            n_pos_all = n_pos_all + n_pos
            wcls = jnp.where(ignore, 0.0, 1.0)
            total_cls = total_cls + losses.sigmoid_focal_loss(
                cs.reshape(B, -1, self.num_classes),
                labels.reshape(B, -1), self.num_classes,
                weight=wcls.reshape(B, -1), avg_factor=1.0)
            total_reg = total_reg + losses.iou_loss(
                boxes.reshape(B, -1, 4), tgt.reshape(B, -1, 4),
                weight=pos.reshape(B, -1).astype(jnp.float32),
                avg_factor=1.0)
        n = jnp.maximum(n_pos_all, 1.0)
        return {"loss_cls": total_cls / n, "loss_bbox": total_reg / n}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds = self(images, train=False)
        B = images.shape[0]
        boxes_l, probs_l = [], []
        for li, (cs, bp) in enumerate(zip(cls_scores, bbox_preds)):
            s = float(self.strides[li])
            boxes_l.append(jax.vmap(lambda r: _decode_tblr(r, s))(bp)
                           .reshape(B, -1, 4))
            probs_l.append(jax.nn.sigmoid(cs).reshape(B, -1,
                                                      self.num_classes))
        boxes = jnp.concatenate(boxes_l, 1)
        prob = jnp.concatenate(probs_l, 1)
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

        def one(b, sc, l, v):
            r = batched_nms(b, sc, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(bx, top_s, li, valid)
