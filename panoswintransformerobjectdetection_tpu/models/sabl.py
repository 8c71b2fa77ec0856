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
