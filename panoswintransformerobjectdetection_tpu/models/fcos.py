"""FCOS: anchor-free single-stage detector (`mmdet/models/dense_heads/fcos_head.py`).

Per-level point targets: a point is positive for the smallest-area gt box
containing it whose max regression distance falls in the level's range;
centerness = sqrt(min/max(l,r) * min/max(t,b)).  Losses: focal (cls),
IoU (boxes, centerness-weighted), BCE (centerness).  Fixed-shape batched
target assignment via vmap — no per-image loops.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import trunc_init, resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build

INF = 1e8
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


@HEADS.register
class FCOSHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    # centerness branch on the reg tower (True, the centeronreg variant)
    # or the cls tower (False, the stock mmdet default) — both appear in
    # configs/fcos
    centerness_on_reg: bool = True
    # norm_on_bbox (configs/fcos *normbbox*): relu-parameterized distances
    # scaled by the level stride instead of exp
    norm_on_bbox: bool = False
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
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
                          name="fcos_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=dt, name="fcos_reg")
        ctr_out = nn.Conv(1, (3, 3), padding=1, dtype=dt, name="fcos_centerness")
        scales = self.param("scales", nn.initializers.ones, (len(feats),))

        cls_scores, bbox_preds, centernesses = [], [], []
        for li, f in enumerate(feats):
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            cls_scores.append(cls_out(c).astype(jnp.float32))
            raw = reg_out(r).astype(jnp.float32) * scales[li]
            if self.norm_on_bbox:
                bbox_preds.append(nn.relu(raw) * float(self.strides[li]))
            else:
                bbox_preds.append(jnp.exp(raw))
            centernesses.append(ctr_out(
                r if self.centerness_on_reg else c).astype(jnp.float32))
        return tuple(cls_scores), tuple(bbox_preds), tuple(centernesses)


def _level_points(h, w, stride):
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float32)


def fcos_targets(points, ranges, gts, glabels, gvalid, num_classes,
                 strides=None, center_sample_radius=0.0):
    """points: (N, 2); ranges: (N, 2); gts: (G, 4).  One image.

    strides + center_sample_radius > 0 enable center sampling
    (`fcos_head.py` center_sampling): positives restricted to the
    radius*stride box around each gt center, clamped inside the gt.

    Returns labels (N,), ltrb (N, 4), centerness (N,)."""
    x, y = points[:, 0][:, None], points[:, 1][:, None]
    l = x - gts[:, 0][None, :]  # noqa: E741 — FCOS (l, t, r, b) naming
    t = y - gts[:, 1][None, :]
    r = gts[:, 2][None, :] - x
    b = gts[:, 3][None, :] - y
    ltrb = jnp.stack([l, t, r, b], -1)                 # (N, G, 4)
    inside = ltrb.min(-1) > 0
    if strides is not None and center_sample_radius > 0:
        cx = (gts[:, 0] + gts[:, 2])[None, :] / 2
        cy = (gts[:, 1] + gts[:, 3])[None, :] / 2
        rad = center_sample_radius * strides[:, None]
        x1 = jnp.maximum(cx - rad, gts[:, 0][None, :])
        x2 = jnp.minimum(cx + rad, gts[:, 2][None, :])
        y1 = jnp.maximum(cy - rad, gts[:, 1][None, :])
        y2 = jnp.minimum(cy + rad, gts[:, 3][None, :])
        inside = inside & (x > x1) & (x < x2) & (y > y1) & (y < y2)
    maxd = ltrb.max(-1)
    in_range = (maxd >= ranges[:, 0:1]) & (maxd <= ranges[:, 1:2])
    areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    cand = inside & in_range & gvalid[None, :]
    area_masked = jnp.where(cand, areas[None, :], INF)
    gidx = jnp.argmin(area_masked, axis=1)
    pos = area_masked.min(axis=1) < INF

    labels = jnp.where(pos, glabels[gidx], num_classes)
    sel = jnp.take_along_axis(ltrb, gidx[:, None, None].repeat(4, -1), 1)[:, 0]
    lr = jnp.stack([sel[:, 0], sel[:, 2]], -1)
    tb = jnp.stack([sel[:, 1], sel[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6)) *
        (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0.0, 1.0))
    return labels, sel, jnp.where(pos, ctr, 0.0), pos


@DETECTORS.register
class FCOS(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # configs/fcos variants
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = True
    use_giou: bool = False
    compute_dtype: Any = None

    def setup(self):
        bb = dict(self.backbone)
        if self.compute_dtype is not None:
            bb.setdefault("dtype", self.compute_dtype)
        self.backbone_m = build(BACKBONES, bb)
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        if self.compute_dtype is not None:
            neck_cfg.setdefault("dtype", self.compute_dtype)
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = FCOSHead(num_classes=self.num_classes,
                               centerness_on_reg=self.centerness_on_reg,
                               norm_on_bbox=self.norm_on_bbox,
                               strides=self.strides,
                               dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _points_and_ranges(self, cls_scores):
        pts, rgs = [], []
        for (c, s, rr) in zip(cls_scores, self.strides, REGRESS_RANGES):
            p = _level_points(c.shape[1], c.shape[2], s)
            pts.append(p)
            rgs.append(np.tile(np.asarray(rr, np.float32), (len(p), 1)))
        return (jnp.asarray(np.concatenate(pts)),
                jnp.asarray(np.concatenate(rgs)))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, centernesses = self(images, train=True)
        points, ranges = self._points_and_ranges(cls_scores)
        B = images.shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        ctr = jnp.concatenate([c.reshape(B, -1) for c in centernesses], 1)

        pt_strides = jnp.asarray(np.concatenate(
            [np.full(c.shape[1] * c.shape[2], float(s), np.float32)
             for c, s in zip(cls_scores, self.strides)]))
        radius = self.center_sample_radius if self.center_sampling else 0.0
        labels, ltrb, ctr_t, pos = jax.vmap(
            lambda g, l, v: fcos_targets(points, ranges, g, l, v,
                                         self.num_classes,
                                         strides=pt_strides,
                                         center_sample_radius=radius))(
            gt_boxes, gt_labels, gt_valid)
        ltrb = jax.lax.stop_gradient(ltrb)
        ctr_t = jax.lax.stop_gradient(ctr_t)

        num_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=num_pos)
        # decode both to boxes for IoU loss
        px = points[None, :, 0]
        py = points[None, :, 1]
        pred_boxes = jnp.stack([px - reg[..., 0], py - reg[..., 1],
                                px + reg[..., 2], py + reg[..., 3]], -1)
        tgt_boxes = jnp.stack([px - ltrb[..., 0], py - ltrb[..., 1],
                               px + ltrb[..., 2], py + ltrb[..., 3]], -1)
        w = pos.astype(jnp.float32) * ctr_t
        box_loss = losses.giou_loss if self.use_giou else losses.iou_loss
        loss_bbox = box_loss(pred_boxes, tgt_boxes, weight=w,
                             avg_factor=jnp.maximum(w.sum(), 1e-6))
        loss_ctr = losses.binary_cross_entropy(
            ctr, ctr_t, weight=pos.astype(jnp.float32), avg_factor=num_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_centerness": loss_ctr}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds, centernesses = self(images, train=False)
        B = images.shape[0]
        all_s, all_b, all_l = [], [], []
        for c, r, ct, stride in zip(cls_scores, bbox_preds, centernesses,
                                    self.strides):
            pts = jnp.asarray(_level_points(c.shape[1], c.shape[2], stride))
            sc = jax.nn.sigmoid(c.reshape(B, -1, self.num_classes)) * \
                jax.nn.sigmoid(ct.reshape(B, -1, 1))
            rg = r.reshape(B, -1, 4)
            flat = sc.reshape(B, -1)
            k = min(nms_pre, flat.shape[1])
            top_s, top_i = jax.lax.top_k(flat, k)
            pi = top_i // self.num_classes
            li = (top_i % self.num_classes).astype(jnp.int32)
            p = pts[pi]
            d = jnp.take_along_axis(rg, pi[..., None], axis=1)
            boxes = jnp.stack([p[..., 0] - d[..., 0], p[..., 1] - d[..., 1],
                               p[..., 0] + d[..., 2], p[..., 1] + d[..., 3]], -1)
            h = img_shapes[:, 0][:, None, None]
            w = img_shapes[:, 1][:, None, None]
            x = jnp.clip(boxes[..., 0::2], 0, w)
            y = jnp.clip(boxes[..., 1::2], 0, h)
            boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
            all_s.append(top_s)
            all_b.append(boxes)
            all_l.append(li)
        scores = jnp.concatenate(all_s, 1)
        boxes = jnp.concatenate(all_b, 1)
        labels = jnp.concatenate(all_l, 1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        valid = scores > score_thr

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(boxes, scores, labels, valid)


# `mmdet/models/detectors/nasfcos.py`: FCOS orchestration with the
# NAS-discovered neck (use neck={"type": "NASFPN", ...}) — the searched
# head conv-cfg is a training-time detail, the detector logic is identical.
DETECTORS.register(FCOS, name="NASFCOS")
