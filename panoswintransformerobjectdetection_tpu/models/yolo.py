"""YOLOv3: Darknet-53 backbone, YOLO neck/head, grid-cell assignment.

Covers the reference's `darknet.py` backbone + `yolo.py` detector +
`yolo_head.py`/`yolo_neck.py`: LeakyReLU conv+BN blocks, residual stages
(1, 2, 8, 8, 4); neck detection blocks with upsample-concat; per-level
3-anchor prediction maps decoding sigmoid-xy + exp-wh; training targets via
classic grid responsibility (gt center cell, best shape-IoU anchor),
fixed-shape via scatter over (level, cell, anchor) slots.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.bbox import bbox_overlaps
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .registry import BACKBONES, NECKS, DETECTORS, build
from .resnet import _bn

YOLO_ANCHORS = (  # (w, h) per level, large->small stride (mmdet defaults)
    ((116, 90), (156, 198), (373, 326)),
    ((30, 61), (62, 45), (59, 119)),
    ((10, 13), (16, 30), (33, 23)),
)
YOLO_STRIDES = (32, 16, 8)


def conv_bn_leaky(x, ch, k, stride, name, train):
    x = nn.Conv(ch, (k, k), strides=(stride, stride), padding=k // 2,
                use_bias=False, name=f"{name}_conv")(x)
    x = _bn(f"{name}_bn", train)(x)
    return nn.leaky_relu(x, 0.1)


class DarkBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, train=False):
        y = conv_bn_leaky(x, self.ch // 2, 1, 1, "c1", train)
        y = conv_bn_leaky(y, self.ch, 3, 1, "c2", train)
        return x + y


@BACKBONES.register
class Darknet(nn.Module):
    """Darknet-53 (`darknet.py`); returns (C3, C4, C5)."""
    depth: int = 53
    out_indices: Sequence[int] = (2, 3, 4)
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        x = conv_bn_leaky(x, 32, 3, 1, "stem", bn_train)
        outs = []
        for i, (ch, n) in enumerate(((64, 1), (128, 2), (256, 8),
                                     (512, 8), (1024, 4))):
            x = conv_bn_leaky(x, ch, 3, 2, f"down{i}", bn_train)
            for j in range(n):
                x = DarkBlock(ch, name=f"stage{i}_{j}")(x, train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@NECKS.register
class YOLOV3Neck(nn.Module):
    """Detection blocks + upsample-concat (`yolo_neck.py`).  Input
    (C3, C4, C5); output 3 maps large-stride first."""
    out_channels: Sequence[int] = (512, 256, 128)

    @nn.compact
    def __call__(self, feats, train=False):
        c3, c4, c5 = feats

        def det_block(x, ch, name):
            for i, (c, k) in enumerate(((ch, 1), (ch * 2, 3), (ch, 1),
                                        (ch * 2, 3), (ch, 1))):
                x = conv_bn_leaky(x, c, k, 1, f"{name}_{i}", train)
            return x

        from .fpn import nearest_upsample
        o1 = det_block(c5, self.out_channels[0], "db1")
        u = conv_bn_leaky(o1, self.out_channels[1], 1, 1, "lat1", train)
        u = nearest_upsample(u, c4.shape[1], c4.shape[2])
        o2 = det_block(jnp.concatenate([u, c4], -1), self.out_channels[1], "db2")
        u = conv_bn_leaky(o2, self.out_channels[2], 1, 1, "lat2", train)
        u = nearest_upsample(u, c3.shape[1], c3.shape[2])
        o3 = det_block(jnp.concatenate([u, c3], -1), self.out_channels[2], "db3")
        return o1, o2, o3


@DETECTORS.register
class YOLOV3(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    ignore_iou: float = 0.5

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        self.neck_m = build(NECKS, dict(self.neck or {"type": "YOLOV3Neck"}))
        self.heads = [nn.Conv(3 * (5 + self.num_classes), (1, 1),
                              name=f"head_{i}") for i in range(3)]
        self.bridges = [nn.Conv(c * 2, (3, 3), padding=1, name=f"bridge_{i}")
                        for i, c in enumerate((512, 256, 128))]

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train), train=train)
        return tuple(h(nn.relu(b(f)))
                     for h, b, f in zip(self.heads, self.bridges, feats))

    def _decode_level(self, pred, anchors, stride):
        """pred: (B, h, w, 3*(5+C)) -> boxes (B, h*w*3, 4), obj, cls."""
        B, h, w, _ = pred.shape
        C = self.num_classes
        p = pred.reshape(B, h, w, 3, 5 + C)
        gx = (jnp.arange(w, dtype=jnp.float32))[None, None, :, None]
        gy = (jnp.arange(h, dtype=jnp.float32))[None, :, None, None]
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)[None, None, None, :]
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)[None, None, None, :]
        cx = (jax.nn.sigmoid(p[..., 0]) + gx) * stride
        cy = (jax.nn.sigmoid(p[..., 1]) + gy) * stride
        bw = jnp.exp(jnp.clip(p[..., 2], -8, 8)) * aw
        bh = jnp.exp(jnp.clip(p[..., 3], -8, 8)) * ah
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        return (boxes.reshape(B, -1, 4), p[..., 4].reshape(B, -1),
                p[..., 5:].reshape(B, -1, C), p.reshape(B, -1, 5 + C))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        preds = self(images, train=True)
        B, G = gt_labels.shape
        total_obj = total_xywh = total_cls = 0.0
        n_pos_total = 0.0
        for li, (pred, anchors, stride) in enumerate(
                zip(preds, YOLO_ANCHORS, YOLO_STRIDES)):
            h, w = pred.shape[1:3]
            boxes, obj, cls, raw = self._decode_level(pred, anchors, stride)
            N = boxes.shape[1]

            def per_img(gts, glabels, gvalid, boxes_i):
                gw = gts[:, 2] - gts[:, 0]
                gh = gts[:, 3] - gts[:, 1]
                all_anchors = jnp.asarray(
                    [a for lvl in YOLO_ANCHORS for a in lvl], jnp.float32)
                inter = jnp.minimum(gw[:, None], all_anchors[None, :, 0]) * \
                    jnp.minimum(gh[:, None], all_anchors[None, :, 1])
                union = gw[:, None] * gh[:, None] + \
                    all_anchors[None, :, 0] * all_anchors[None, :, 1] - inter
                best = jnp.argmax(inter / jnp.maximum(union, 1e-6), 1)
                sel_lvl = best // 3
                sel_a = best % 3
                cxg = jnp.clip(((gts[:, 0] + gts[:, 2]) / 2 // stride
                                ).astype(jnp.int32), 0, w - 1)
                cyg = jnp.clip(((gts[:, 1] + gts[:, 3]) / 2 // stride
                                ).astype(jnp.int32), 0, h - 1)
                flat = (cyg * w + cxg) * 3 + sel_a
                use = gvalid & (sel_lvl == li)
                slot_gt = jnp.zeros((N,), jnp.int32).at[
                    jnp.where(use, flat, N)].max(
                    jnp.where(use, jnp.arange(G, dtype=jnp.int32) + 1, 0),
                    mode="drop")
                iou = bbox_overlaps(gts, boxes_i)
                iou = jnp.where(gvalid[:, None], iou, 0.0).max(0)
                return slot_gt, iou

            slot_gt, max_iou = jax.vmap(per_img)(
                gt_boxes, gt_labels, gt_valid, boxes)
            pos = slot_gt > 0
            gidx = jnp.clip(slot_gt - 1, 0)
            n_pos = pos.sum()
            n_pos_total += n_pos

            # objectness: BCE, positives 1, negatives 0 except ignored
            neg_w = ((~pos) & (max_iou < self.ignore_iou)).astype(jnp.float32)
            pos_w = pos.astype(jnp.float32)
            total_obj += losses.binary_cross_entropy(
                obj, pos_w, weight=pos_w + neg_w,
                avg_factor=jnp.maximum((pos_w + neg_w).sum(), 1.0))

            # xywh on positives: raw-space targets
            tg = jnp.take_along_axis(gt_boxes, gidx[..., None].repeat(4, -1), 1)
            tcx = (tg[..., 0] + tg[..., 2]) / 2 / stride
            tcy = (tg[..., 1] + tg[..., 3]) / 2 / stride
            cell = jnp.arange(N) // 3
            tx = tcx - jnp.floor(tcx)
            ty = tcy - jnp.floor(tcy)
            a_all = jnp.asarray(anchors, jnp.float32)
            aw = a_all[jnp.arange(N) % 3, 0]
            ah = a_all[jnp.arange(N) % 3, 1]
            tw = jnp.log(jnp.clip((tg[..., 2] - tg[..., 0]) / aw[None], 1e-4))
            th = jnp.log(jnp.clip((tg[..., 3] - tg[..., 1]) / ah[None], 1e-4))
            pr = raw
            l_xy = losses.binary_cross_entropy(
                pr[..., 0:2],
                jax.lax.stop_gradient(jnp.stack([tx, ty], -1)),
                weight=pos_w[..., None], avg_factor=jnp.maximum(n_pos, 1.0))
            l_wh = losses.smooth_l1_loss(
                pr[..., 2:4],
                jax.lax.stop_gradient(jnp.stack([tw, th], -1)),
                weight=pos_w[..., None], avg_factor=jnp.maximum(n_pos, 1.0))
            total_xywh += l_xy + l_wh

            tl = jnp.take_along_axis(gt_labels, gidx, 1)
            onehot = jax.nn.one_hot(tl, self.num_classes)
            total_cls += losses.binary_cross_entropy(
                cls, onehot, weight=pos_w[..., None],
                avg_factor=jnp.maximum(n_pos, 1.0))

        return {"loss_obj": total_obj, "loss_xywh": total_xywh,
                "loss_cls_yolo": total_cls}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, conf_thr=0.05, iou_threshold=0.45,
                    max_per_img=100) -> DetResult:
        preds = self(images, train=False)
        B = images.shape[0]
        bs, ss, ls = [], [], []
        for pred, anchors, stride in zip(preds, YOLO_ANCHORS, YOLO_STRIDES):
            boxes, obj, cls, _ = self._decode_level(pred, anchors, stride)
            conf = jax.nn.sigmoid(obj)[..., None] * jax.nn.sigmoid(cls)
            k = min(300, conf.shape[1] * conf.shape[2])
            flat = conf.reshape(B, -1)
            top_s, top_i = jax.lax.top_k(flat, k)
            ai = top_i // self.num_classes
            li = (top_i % self.num_classes).astype(jnp.int32)
            bx = jnp.take_along_axis(boxes, ai[..., None].repeat(4, -1), 1)
            h = img_shapes[:, 0][:, None, None]
            w = img_shapes[:, 1][:, None, None]
            x = jnp.clip(bx[..., 0::2], 0, w)
            y = jnp.clip(bx[..., 1::2], 0, h)
            bx = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
            bs.append(bx)
            ss.append(top_s)
            ls.append(li)
        boxes = jnp.concatenate(bs, 1)
        scores = jnp.concatenate(ss, 1)
        labels = jnp.concatenate(ls, 1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        valid = scores > conf_thr

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(boxes, scores, labels, valid)
