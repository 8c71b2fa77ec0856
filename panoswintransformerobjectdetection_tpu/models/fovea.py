"""FoveaBox detector (`mmdet/models/dense_heads/fovea_head.py` +
`detectors/fovea.py`): anchor-free per-pixel classification where each gt
claims the shrunken "fovea" (sigma-scaled center region) of its scale-matched
pyramid level; boxes regress log-normalized corner offsets against a
per-level base edge.

Fixed-shape target building: instead of sorting gts by area and overwriting
sequentially (reference `_get_target_single`), each pixel picks the
smallest-area gt whose fovea covers it — the same winner the reference's
descending-area write order produces.
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

SCALE_RANGES = ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
BASE_EDGES = (16, 32, 64, 128, 256)


@HEADS.register
class FoveaHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    # FoveaBox align variant (configs/foveabox fovea_align_*): a
    # deformable FeatureAlign conv on the cls tower whose offsets are
    # predicted from the (detached-scale) bbox output, deform_groups=4
    with_deform: bool = False
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
                          name="fovea_cls")
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=dt, name="fovea_reg")
        if self.with_deform:
            offset_conv = nn.Conv(2 * 9, (1, 1),
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name="align_offset")
            align_kernel = self.param(
                "align_kernel", nn.initializers.he_normal(),
                (9, self.feat_channels, self.feat_channels))
        cls_o, reg_o = [], []
        for f in feats:
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            reg_pred = reg_out(r).astype(jnp.float32)
            if self.with_deform:
                # FeatureAlign (`fovea_head.py` with_deform): offsets from
                # the bbox prediction reshape the cls receptive field
                from ..ops.deform_conv import deform_conv2d
                off = offset_conv(jax.lax.stop_gradient(reg_pred))
                c = nn.relu(deform_conv2d(c, off, align_kernel))
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            cls_o.append(cls_out(c).astype(jnp.float32))
            reg_o.append(reg_pred)
        return tuple(cls_o), tuple(reg_o)


def fovea_targets_level(gts, glabels, gvalid, num_classes, H, W, stride,
                        base_len, bound, sigma=0.4):
    """Per-level targets: labels (H, W) and log-space bbox targets
    (H, W, 4).  Each pixel takes the smallest-area covering gt."""
    lo, hi = bound
    area = jnp.sqrt(jnp.clip((gts[:, 2] - gts[:, 0]) *
                             (gts[:, 3] - gts[:, 1]), 0))
    hit = (area >= lo) & (area <= hi) & gvalid                       # (G,)
    g = gts / stride
    half_w = 0.5 * (g[:, 2] - g[:, 0])
    half_h = 0.5 * (g[:, 3] - g[:, 1])
    left = jnp.clip(jnp.ceil(g[:, 0] + (1 - sigma) * half_w - 0.5), 0, W - 1)
    right = jnp.clip(jnp.floor(g[:, 0] + (1 + sigma) * half_w - 0.5), 0, W - 1)
    top = jnp.clip(jnp.ceil(g[:, 1] + (1 - sigma) * half_h - 0.5), 0, H - 1)
    down = jnp.clip(jnp.floor(g[:, 1] + (1 + sigma) * half_h - 0.5), 0, H - 1)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    cover = (hit[:, None, None] &
             (ys[None, :, None] >= top[:, None, None]) &
             (ys[None, :, None] <= down[:, None, None]) &
             (xs[None, None, :] >= left[:, None, None]) &
             (xs[None, None, :] <= right[:, None, None]))           # (G,H,W)
    # smallest-area covering gt wins (reference writes big->small)
    key = jnp.where(cover, area[:, None, None], jnp.inf)
    winner = key.argmin(0)                                          # (H, W)
    has = jnp.isfinite(key.min(0))
    labels = jnp.where(has, glabels[winner], num_classes)
    gw = gts[winner]                                                # (H, W, 4)
    px = xs[None, :] * stride
    py = ys[:, None] * stride
    t = jnp.stack([(px - gw[..., 0]) / base_len,
                   (py - gw[..., 1]) / base_len,
                   (gw[..., 2] - px) / base_len,
                   (gw[..., 3] - py) / base_len], -1)
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    return labels, jnp.where(has[..., None], t, 0.0), has


@DETECTORS.register
class FOVEA(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    sigma: float = 0.4
    with_deform: bool = False
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = FoveaHead(num_classes=self.num_classes,
                                with_deform=self.with_deform,
                                dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = self(images, train=True)
        B = images.shape[0]
        all_cls, all_reg, all_lab, all_tgt, all_pos = [], [], [], [], []
        for li, (cs, bp) in enumerate(zip(cls_scores, bbox_preds)):
            H, W = cs.shape[1:3]
            lab, tgt, pos = jax.vmap(
                lambda g, l, v: fovea_targets_level(
                    g, l, v, self.num_classes, H, W, self.strides[li],
                    BASE_EDGES[li], SCALE_RANGES[li], self.sigma))(
                gt_boxes, gt_labels, gt_valid)
            all_cls.append(cs.reshape(B, -1, self.num_classes))
            all_reg.append(bp.reshape(B, -1, 4))
            all_lab.append(lab.reshape(B, -1))
            all_tgt.append(tgt.reshape(B, -1, 4))
            all_pos.append(pos.reshape(B, -1))
        cls = jnp.concatenate(all_cls, 1)
        reg = jnp.concatenate(all_reg, 1)
        lab = jax.lax.stop_gradient(jnp.concatenate(all_lab, 1))
        tgt = jax.lax.stop_gradient(jnp.concatenate(all_tgt, 1))
        pos = jnp.concatenate(all_pos, 1)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = losses.sigmoid_focal_loss(cls, lab, self.num_classes,
                                             avg_factor=n_pos)
        w = pos.astype(jnp.float32)[..., None].repeat(4, -1)
        loss_bbox = losses.smooth_l1_loss(reg, tgt, beta=0.11, weight=w,
                                          avg_factor=4 * n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds = self(images, train=False)
        B = images.shape[0]
        boxes_l, probs_l = [], []
        for li, (cs, bp) in enumerate(zip(cls_scores, bbox_preds)):
            H, W = cs.shape[1:3]
            s, bl = self.strides[li], BASE_EDGES[li]
            ys = jnp.arange(H, dtype=jnp.float32)[:, None] * s
            xs = jnp.arange(W, dtype=jnp.float32)[None, :] * s
            e = jnp.exp(jnp.clip(bp, -10, 4)) * bl
            x1 = xs[None, ..., None] - e[..., 0:1]
            y1 = ys[None, ..., None] - e[..., 1:2]
            x2 = xs[None, ..., None] + e[..., 2:3]
            y2 = ys[None, ..., None] + e[..., 3:4]
            boxes_l.append(jnp.concatenate([x1, y1, x2, y2],
                                           -1).reshape(B, -1, 4))
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

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(bx, top_s, li, valid)
