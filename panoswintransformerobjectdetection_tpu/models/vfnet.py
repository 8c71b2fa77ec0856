"""VarifocalNet (`mmdet/models/dense_heads/vfnet_head.py` +
`detectors/vfnet.py`): FCOS-style towers producing an initial ltrb box, a
star-shaped deformable refinement sampled at 9 points ON the initial box
(corners / edge midpoints / center), and an IoU-aware classification score
trained with varifocal loss against the refined box's IoU.

Assignment is ATSS on the implicit octave-8 anchors (the reference default).
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
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


def star_dcn_offset(dist: jnp.ndarray, stride: float) -> jnp.ndarray:
    """Initial ltrb distances (H, W, 4) in image units -> (H, W, 18) DCN
    offsets placing the 9 taps on the box (`vfnet_head.py star_dcn_offset`).
    Offsets are deltas from the regular 3x3 grid ((dy, dx) per tap, matching
    `ops.deform_conv.deform_conv2d`)."""
    l, t, r, b = (dist[..., 0] / stride, dist[..., 1] / stride,
                  dist[..., 2] / stride, dist[..., 3] / stride)
    zero = jnp.zeros_like(l)
    ys = [-t, zero, b]
    xs = [-l, zero, r]
    offs = []
    for i in range(3):
        for j in range(3):
            offs.append(ys[i] - (i - 1))   # dy relative to base tap
            offs.append(xs[j] - (j - 1))   # dx
    return jnp.stack(offs, -1)


@HEADS.register
class VFNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, strides):
        dt = resolve_dtype(self.dtype)
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"reg_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_init_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                                dtype=dt, name="reg_init_conv")
        reg_init_out = nn.Conv(4, (3, 3), padding=1, dtype=dt,
                               name="reg_init_out")
        reg_dcn_w = self.param("reg_refine_dcn",
                               nn.initializers.he_normal(),
                               (9, self.feat_channels, self.feat_channels))
        reg_refine_out = nn.Conv(4, (3, 3), padding=1, dtype=dt,
                                 name="reg_refine_out")
        cls_dcn_w = self.param("cls_dcn", nn.initializers.he_normal(),
                               (9, self.feat_channels, self.feat_channels))
        cls_out = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="vfnet_cls")
        scales = self.param("scales", nn.initializers.ones, (len(feats),))
        scales_ref = self.param("scales_refine", nn.initializers.ones,
                                (len(feats),))
        cls_l, init_l, refine_l = [], [], []
        for li, f in enumerate(feats):
            s = float(strides[li])
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            ri = nn.relu(reg_init_conv(r)).astype(jnp.float32)
            d_init = jnp.exp(jnp.clip(
                reg_init_out(ri).astype(jnp.float32) * scales[li],
                -10, 8)) * s                                    # (B,H,W,4)
            off = jax.vmap(lambda d: star_dcn_offset(d, s))(
                jax.lax.stop_gradient(d_init))
            r32 = r.astype(jnp.float32)
            rf = nn.relu(deform_conv2d(r32, off,
                                       reg_dcn_w.astype(jnp.float32)))
            delta = jnp.exp(jnp.clip(
                reg_refine_out(rf.astype(dt) if dt else rf)
                .astype(jnp.float32) * scales_ref[li], -8, 8))
            d_refine = d_init * delta
            cf = nn.relu(deform_conv2d(c.astype(jnp.float32), off,
                                       cls_dcn_w.astype(jnp.float32)))
            cls = cls_out(cf.astype(dt) if dt else cf).astype(jnp.float32)
            cls_l.append(cls)
            init_l.append(d_init)
            refine_l.append(d_refine)
        return tuple(cls_l), tuple(init_l), tuple(refine_l)


@DETECTORS.register
class VFNet(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    topk: int = 9
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = VFNetHead(num_classes=self.num_classes,
                                dtype=self.compute_dtype)
        self.anchor_gen = AnchorGenerator(
            strides=self.strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats, self.strides)

    def _flatten(self, cls_l, init_l, refine_l):
        B = cls_l[0].shape[0]
        sizes = [tuple(c.shape[1:3]) for c in cls_l]
        per_level = self.anchor_gen.grid_anchors(sizes)
        slices, start = [], 0
        centers_l = []
        for li, (a, c) in enumerate(zip(per_level, cls_l)):
            slices.append((start, len(a)))
            start += len(a)
            H, W = c.shape[1:3]
            s = float(self.strides[li])
            xs = jnp.arange(W, dtype=jnp.float32) * s
            ys = jnp.arange(H, dtype=jnp.float32) * s
            gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
            centers_l.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        anchors = jnp.asarray(np.concatenate(per_level))
        centers = jnp.concatenate(centers_l, 0)
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_l], 1)

        def dist2box(dflat):
            return jnp.stack([centers[None, :, 0] - dflat[..., 0],
                              centers[None, :, 1] - dflat[..., 1],
                              centers[None, :, 0] + dflat[..., 2],
                              centers[None, :, 1] + dflat[..., 3]], -1)

        initb = dist2box(jnp.concatenate(
            [d.reshape(B, -1, 4) for d in init_l], 1))
        refineb = dist2box(jnp.concatenate(
            [d.reshape(B, -1, 4) for d in refine_l], 1))
        return cls, initb, refineb, anchors, tuple(slices)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_l, init_l, refine_l = self(images, train=True)
        cls, initb, refineb, anchors, slices = self._flatten(
            cls_l, init_l, refine_l)

        def single(refined, gts, glabels, gvalid):
            assigned = atss_assign(anchors, slices, gts, gvalid, self.topk)
            pos = assigned > 0
            gidx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gidx], self.num_classes)
            tgt = gts[gidx]
            iou = jax.vmap(lambda p, t: bbox_overlaps(p[None],
                                                      t[None])[0, 0])(
                jax.lax.stop_gradient(refined), tgt)
            return pos, labels, tgt, jnp.where(pos, iou, 0.0)

        pos, labels, tgt, iou = jax.vmap(single)(
            refineb, gt_boxes, gt_labels, gt_valid)
        tgt = jax.lax.stop_gradient(tgt)
        iou = jax.lax.stop_gradient(iou)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        # IoU-aware cls target: refined-box IoU on the gt class channel
        vf_t = (jax.nn.one_hot(jnp.where(pos, labels, 0), self.num_classes)
                * iou[..., None] * pos[..., None])
        loss_cls = losses.varifocal_loss(cls, vf_t,
                                         avg_factor=jnp.maximum(
                                             iou.sum(), 1.0))
        w = pos.astype(jnp.float32)
        loss_init = 1.5 * losses.giou_loss(initb, tgt, weight=w,
                                           avg_factor=n_pos)
        loss_refine = 2.0 * losses.giou_loss(refineb, tgt, weight=w,
                                             avg_factor=n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_init,
                "loss_bbox_rf": loss_refine}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
                    max_per_img=100) -> DetResult:
        cls_l, init_l, refine_l = self(images, train=False)
        cls, _, boxes, _, _ = self._flatten(cls_l, init_l, refine_l)
        B = images.shape[0]
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
