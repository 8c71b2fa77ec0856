"""Cascade RPN (`mmdet/models/dense_heads/cascade_rpn_head.py`, NeurIPS'19):
a two-stage region proposal head — stage 1 regresses a refinement of a
single center anchor per cell through a dilated "adaptive" conv; stage 2
re-aligns its features to the REFINED anchors with an offset-driven
deformable conv (the `AdaptiveConv` 'offset' mode) and predicts
objectness + a second refinement.  Proposals come from stage 2.

Standalone proposal module: `cascade_rpn_proposals` yields the same
`Proposals` contract as `rpn_head.rpn_proposals`, so it can serve as a
drop-in proposal stage for the two-stage detectors.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.assigner import max_iou_assign
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import batched_nms, NEG_INF
from .layers import resolve_dtype
from .registry import HEADS
from .rpn_head import Proposals


def anchor_offsets(anchors: jnp.ndarray, stride: float, H: int,
                   W: int) -> jnp.ndarray:
    """Offsets aligning a 3x3 kernel's taps to an anchor's 3x3 grid
    (`cascade_rpn_head.py` AdaptiveConv offset mode).  anchors (H*W, 4) in
    image coords -> (H, W, 18) (dy, dx) per tap."""
    a = anchors.reshape(H, W, 4) / stride
    # -0.5: image coord (i + 0.5) * stride is pixel index i in the
    # deform_conv2d sampling convention
    cx = (a[..., 0] + a[..., 2]) / 2 - 0.5
    cy = (a[..., 1] + a[..., 3]) / 2 - 0.5
    w = (a[..., 2] - a[..., 0])
    h = (a[..., 3] - a[..., 1])
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    offs = []
    for i in range(3):
        for j in range(3):
            py = cy + (i - 1) * h / 2 - ys
            px = cx + (j - 1) * w / 2 - xs
            offs.append(py - (i - 1))
            offs.append(px - (j - 1))
    return jnp.stack(offs, -1)


@HEADS.register
class CascadeRPNHead(nn.Module):
    feat_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, strides, anchor_scale: float = 8.0):
        """Returns per-level (anchors1 (B,HW,4) refined anchors,
        cls (B,HW), reg2 (B,HW,4)) plus flat stage-1 regs for the loss."""
        dt = resolve_dtype(self.dtype)
        s1_w = self.param("stage1_kernel", nn.initializers.he_normal(),
                          (9, self.feat_channels, self.feat_channels))
        s1_reg = nn.Conv(4, (1, 1), dtype=dt, name="stage1_reg")
        s2_w = self.param("stage2_kernel", nn.initializers.he_normal(),
                          (9, self.feat_channels, self.feat_channels))
        s2_cls = nn.Conv(1, (1, 1), dtype=dt, name="stage2_cls")
        s2_reg = nn.Conv(4, (1, 1), dtype=dt, name="stage2_reg")
        out = []
        for li, f in enumerate(feats):
            B, H, W, _ = f.shape
            s = float(strides[li])
            f32 = f.astype(jnp.float32)
            # stage 1: dilation-mode adaptive conv == dilated regular taps
            x1 = nn.relu(jax.lax.conv_general_dilated(
                f32, s1_w.reshape(3, 3, self.feat_channels,
                                  self.feat_channels),
                (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            reg1 = s1_reg(x1.astype(dt) if dt else x1).astype(jnp.float32)
            # single square center anchor per cell
            half = anchor_scale * s / 2
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * s
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * s
            gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
            ctr = jnp.stack([gx, gy], -1).reshape(-1, 2)
            anchors0 = jnp.concatenate([ctr - half, ctr + half], -1)
            anchors1 = jax.vmap(lambda r: delta_decode(
                anchors0, r.reshape(-1, 4),
                stds=(0.1, 0.1, 0.5, 0.5)))(reg1)
            # stage 2: offset-mode adaptive conv aligned to anchors1
            off = jax.vmap(lambda a: anchor_offsets(
                jax.lax.stop_gradient(a), s, H, W))(anchors1)
            x2 = nn.relu(deform_conv2d(f32, off, s2_w))
            x2c = x2.astype(dt) if dt else x2
            cls = s2_cls(x2c).astype(jnp.float32).reshape(B, -1)
            reg2 = s2_reg(x2c).astype(jnp.float32).reshape(B, -1, 4)
            out.append((anchors0, anchors1, reg1.reshape(B, -1, 4), cls,
                        reg2))
        return out


def cascade_rpn_loss(head_out, gt_boxes, gt_valid,
                     stds=(0.1, 0.1, 0.5, 0.5)) -> Dict[str, jnp.ndarray]:
    """Stage-1 reg (IoU-assigned on the base anchors), stage-2 cls + reg
    (assigned on the refined anchors)."""
    a0 = jnp.concatenate([o[0] for o in head_out], 0)
    a1 = jnp.concatenate([o[1] for o in head_out], 1)
    r1 = jnp.concatenate([o[2] for o in head_out], 1)
    cls = jnp.concatenate([o[3] for o in head_out], 1)
    r2 = jnp.concatenate([o[4] for o in head_out], 1)

    def single(a1_i, gts, gvalid):
        ious0 = bbox_overlaps(gts, a0)
        as0, _ = max_iou_assign(ious0, gvalid, pos_iou_thr=0.7,
                                neg_iou_thr=0.3)
        pos0 = as0 > 0
        t0 = delta_encode(a0, gts[jnp.clip(as0 - 1, 0)], stds=stds)
        ious1 = bbox_overlaps(gts, jax.lax.stop_gradient(a1_i))
        as1, _ = max_iou_assign(ious1, gvalid, pos_iou_thr=0.7,
                                neg_iou_thr=0.3)
        pos1 = as1 > 0
        neg1 = as1 == 0
        t1 = delta_encode(jax.lax.stop_gradient(a1_i),
                          gts[jnp.clip(as1 - 1, 0)], stds=stds)
        return pos0, t0, pos1, neg1, t1

    pos0, t0, pos1, neg1, t1 = jax.vmap(single)(a1, gt_boxes, gt_valid)
    n0 = jnp.maximum(pos0.sum(), 1.0)
    n1 = jnp.maximum(pos1.sum(), 1.0)
    loss_reg1 = losses.smooth_l1_loss(
        r1, jax.lax.stop_gradient(t0),
        weight=pos0[..., None].astype(jnp.float32), avg_factor=n0)
    loss_reg2 = losses.smooth_l1_loss(
        r2, jax.lax.stop_gradient(t1),
        weight=pos1[..., None].astype(jnp.float32), avg_factor=n1)
    wc = (pos1 | neg1).astype(jnp.float32)
    loss_cls = losses.binary_cross_entropy(
        cls, pos1.astype(jnp.float32), weight=wc,
        avg_factor=jnp.maximum(wc.sum(), 1.0))
    return {"loss_rpn_reg_s1": loss_reg1, "loss_rpn_cls": loss_cls,
            "loss_rpn_reg_s2": loss_reg2}


def cascade_rpn_proposals(head_out, img_shapes, *, nms_pre=1000,
                          max_per_img=1000, iou_threshold=0.7,
                          stds=(0.1, 0.1, 0.5, 0.5)) -> Proposals:
    a1 = jnp.concatenate([o[1] for o in head_out], 1)
    cls = jnp.concatenate([o[3] for o in head_out], 1)
    r2 = jnp.concatenate([o[4] for o in head_out], 1)
    B, N = cls.shape
    boxes = jax.vmap(lambda a, r: delta_decode(a, r, stds=stds))(a1, r2)
    h = img_shapes[:, 0][:, None, None]
    w = img_shapes[:, 1][:, None, None]
    x = jnp.clip(boxes[..., 0::2], 0, w)
    y = jnp.clip(boxes[..., 1::2], 0, h)
    boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
    scores = jax.nn.sigmoid(cls)
    k = min(nms_pre, N)
    max_per_img = min(max_per_img, k)
    top_s, top_i = jax.lax.top_k(scores, k)
    bx = jnp.take_along_axis(boxes, top_i[..., None].repeat(4, -1), 1)

    def one(b, s):
        r = batched_nms(b, s, jnp.zeros(b.shape[0], jnp.int32),
                        iou_threshold, max_per_img,
                        jnp.ones(b.shape[0], bool))
        return Proposals(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                         r.mask)

    return jax.vmap(one)(bx, top_s)


from typing import Optional  # noqa: E402

from .registry import BACKBONES, NECKS, DETECTORS, build  # noqa: E402
from .roi_head import (Shared2FCBBoxHead, multilevel_roi_align,  # noqa: E402
                       sample_rois_for_training, bbox_head_loss,
                       bbox_head_detections)
from .detectors import default_train_cfg, default_test_cfg  # noqa: E402


@DETECTORS.register
class CRPNFasterRCNN(nn.Module):
    """Faster R-CNN with the Cascade RPN proposal stage
    (`configs/cascade_rpn/crpn_faster_rcnn_*` role)."""
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    rcnn_target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {"type": "FPN",
                                      "in_channels": (96, 192, 384, 768),
                                      "out_channels": 256, "num_outs": 5})
        self.neck_m = build(NECKS, neck_cfg)
        self.rpn_m = CascadeRPNHead(
            feat_channels=neck_cfg.get("out_channels", 256),
            dtype=self.compute_dtype)
        self.bbox_head_m = Shared2FCBBoxHead(num_classes=self.num_classes,
                                             dtype=self.compute_dtype)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        head_out = self.rpn_m(feats, self.rpn_strides)
        B = images.shape[0]
        dummy = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 32.0, 32.0]],
                                   images.dtype), (B, 1))
        dummy = dummy.at[:, 0].set(jnp.arange(B, dtype=images.dtype))
        rf = multilevel_roi_align(feats[:4], dummy,
                                  strides=self.featmap_strides)
        return feats, head_out, self.bbox_head_m(rf)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        tc = self.train_cfg or default_train_cfg()
        feats = self.neck_m(self.backbone_m(images, train=True))
        head_out = self.rpn_m(feats, self.rpn_strides)
        losses_out = cascade_rpn_loss(head_out, gt_boxes, gt_valid)
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            cascade_rpn_proposals(head_out, img_shapes,
                                  **{k: v for k, v in
                                     tc["rpn_proposal"].items()
                                     if k in ("nms_pre", "max_per_img",
                                              "iou_threshold")}))
        rng = self.make_rng("sampler")
        samples = sample_rois_for_training(
            rng, props.boxes, props.mask, gt_boxes, gt_labels, gt_valid,
            self.num_classes, target_stds=self.rcnn_target_stds,
            **tc["rcnn"])
        B, S, _ = samples.rois.shape
        rf = multilevel_roi_align(feats[:4], samples.rois.reshape(B * S, 5),
                                  strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(rf)
        losses_out.update(bbox_head_loss(cls, reg, samples,
                                         self.num_classes))
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None):
        cfg = self.test_cfg or default_test_cfg()
        feats = self.neck_m(self.backbone_m(images, train=False))
        head_out = self.rpn_m(feats, self.rpn_strides)
        props = cascade_rpn_proposals(
            head_out, img_shapes,
            **{k: v for k, v in cfg["rpn"].items()
               if k in ("nms_pre", "max_per_img", "iou_threshold")})
        B, P, _ = props.boxes.shape
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], props.boxes], -1)
        rf = multilevel_roi_align(feats[:4], rois.reshape(B * P, 5),
                                  strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(rf)
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, -1), rois, img_shapes,
            self.num_classes, target_stds=self.rcnn_target_stds,
            roi_mask=props.mask, scale_factors=scale_factors,
            **cfg["rcnn"])
