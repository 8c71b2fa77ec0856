"""RetinaNet: single-stage anchor detector with focal loss.

Model-zoo coverage of the reference's `retinanet.py` detector +
`retina_head.py`: FPN P3-P7 (extra convs from C5), 4-conv cls/reg towers,
9 anchors per cell (octave base 4, 3 scales/octave, ratios 0.5/1/2),
focal loss (gamma 2, alpha 0.25), per-image NMS over all levels.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.anchors import AnchorGenerator
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..core.assigner import max_iou_assign
from ..core import losses
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import trunc_init, resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build


@HEADS.register
class RetinaHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 9
    feat_channels: int = 256
    stacked_convs: int = 4
    # `retina_sepbn_head.py` (configs/nas_fpn RetinaSepBNHead): convs are
    # shared across pyramid levels but each level keeps its own BatchNorm
    use_sepbn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dt = resolve_dtype(self.dtype)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                             use_bias=not self.use_sepbn,
                             name=f"cls_conv{i}") for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                             use_bias=not self.use_sepbn,
                             name=f"reg_conv{i}") for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3), padding=1,
                          dtype=dt, bias_init=nn.initializers.constant(-4.595),
                          name="retina_cls")   # prior prob 0.01
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1, dtype=dt,
                          name="retina_reg")
        cls_scores, bbox_preds = [], []
        for l, f in enumerate(feats):
            c = r = f if dt is None else f.astype(dt)
            for i, conv in enumerate(cls_convs):
                c = conv(c)
                if self.use_sepbn:
                    c = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     name=f"cls_bn{i}_l{l}")(c)
                c = nn.relu(c)
            for i, conv in enumerate(reg_convs):
                r = conv(r)
                if self.use_sepbn:
                    r = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     name=f"reg_bn{i}_l{l}")(r)
                r = nn.relu(r)
            cls_scores.append(cls_out(c).astype(jnp.float32))
            bbox_preds.append(reg_out(r).astype(jnp.float32))
        return tuple(cls_scores), tuple(bbox_preds)


@DETECTORS.register
class RetinaNet(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    compute_dtype: Any = None
    # optional loss overrides (configs/ghm): {"type": "GHMC", ...} /
    # {"type": "GHMR", ...}; None keeps focal + L1
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    # PISA (configs/pisa pisa_retinanet_*): ISR-P importance reweighting of
    # the positive regression loss + CARL term; dict of isr_k/isr_bias/
    # carl_k/carl_bias/carl_weight or None
    pisa: Optional[dict] = None
    # head overrides (configs/nas_fpn: RetinaSepBNHead -> use_sepbn=True)
    head: Optional[dict] = None

    def setup(self):
        bb = dict(self.backbone)
        if self.compute_dtype is not None:
            bb.setdefault("dtype", self.compute_dtype)
        self.backbone_m = build(BACKBONES, bb)
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True})
        if self.compute_dtype is not None:
            neck_cfg.setdefault("dtype", self.compute_dtype)
        self.neck_m = build(NECKS, neck_cfg)
        head_cfg = {k: v for k, v in dict(self.head or {}).items()
                    if k != "type"}
        self.head_m = RetinaHead(num_classes=self.num_classes,
                                 dtype=self.compute_dtype, **head_cfg)
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4, scales_per_octave=3)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats, train=train)

    def _flat(self, cls_scores, bbox_preds):
        B = cls_scores[0].shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], axis=1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], axis=1)
        return cls, reg

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = self(images, train=True)
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.concatenate(
            [jnp.asarray(a) for a in self.anchor_gen.grid_anchors(sizes)], 0)
        cls, reg = self._flat(cls_scores, bbox_preds)
        B, N, C = cls.shape

        def single(gts, glabels, gvalid):
            ious = bbox_overlaps(gts, anchors)
            assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.5,
                                         neg_iou_thr=0.4, min_pos_iou=0.0,
                                         match_low_quality=True)
            pos = assigned > 0
            gt_idx = jnp.clip(assigned - 1, 0)
            labels = jnp.where(pos, glabels[gt_idx], self.num_classes)
            weights = (assigned >= 0).astype(jnp.float32)
            targets = jax.lax.stop_gradient(
                delta_encode(anchors, gts[gt_idx], stds=self.target_stds))
            miou = jnp.where(pos, jnp.where(gvalid[:, None], ious, -1).max(0),
                             0.0)
            return labels, weights, targets, pos, miou

        labels, weights, targets, pos, mious = jax.vmap(single)(
            gt_boxes, gt_labels, gt_valid)
        num_pos = jnp.maximum(pos.sum(), 1.0)
        if self.loss_cls and self.loss_cls.get("type") == "GHMC":
            loss_cls = losses.ghm_c_loss(
                cls, labels, self.num_classes,
                bins=self.loss_cls.get("bins", 10), weight=weights,
                avg_factor=num_pos)
        else:
            loss_cls = losses.sigmoid_focal_loss(
                cls, labels, self.num_classes, weight=weights,
                avg_factor=num_pos)
        pw = pos[..., None].astype(jnp.float32)
        out_extra = {}
        if self.pisa:
            pflat = pos.reshape(-1).astype(jnp.float32)
            isr = losses.isr_weights(
                mious.reshape(-1), pflat, k=self.pisa.get("isr_k", 2.0),
                bias=self.pisa.get("isr_bias", 0.0)).reshape(pos.shape)
            pw = pw * isr[..., None]
            carl = losses.carl_weights(
                cls.reshape(-1, C), labels.reshape(-1), pflat,
                self.num_classes, k=self.pisa.get("carl_k", 1.0),
                bias=self.pisa.get("carl_bias", 0.2), sigmoid=True)
            out_extra["loss_carl"] = losses.l1_loss(
                reg, targets,
                weight=carl.reshape(pos.shape)[..., None],
                avg_factor=num_pos) * self.pisa.get("carl_weight", 1.0)
        if self.loss_bbox and self.loss_bbox.get("type") == "GHMR":
            loss_bbox = losses.ghm_r_loss(
                reg, targets, mu=self.loss_bbox.get("mu", 0.02),
                bins=self.loss_bbox.get("bins", 10), weight=pw,
                avg_factor=num_pos)
        elif self.loss_bbox and self.loss_bbox.get("type") == "BalancedL1":
            # Libra RetinaNet (`configs/libra_rcnn/libra_retinanet_r50...py:20`)
            loss_bbox = losses.balanced_l1_loss(
                reg, targets, alpha=self.loss_bbox.get("alpha", 0.5),
                gamma=self.loss_bbox.get("gamma", 1.5),
                beta=self.loss_bbox.get("beta", 0.11), weight=pw,
                avg_factor=num_pos) * self.loss_bbox.get("loss_weight", 1.0)
        else:
            loss_bbox = losses.l1_loss(reg, targets, weight=pw,
                                       avg_factor=num_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, **out_extra}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds = self(images, train=False)
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        level_anchors = [jnp.asarray(a) for a in self.anchor_gen.grid_anchors(sizes)]
        B = images.shape[0]

        all_s, all_b, all_l = [], [], []
        for c, r, a in zip(cls_scores, bbox_preds, level_anchors):
            sc = jax.nn.sigmoid(c.reshape(B, -1, self.num_classes))
            rg = r.reshape(B, -1, 4)
            flat = sc.reshape(B, -1)                       # (B, n*C)
            k = min(nms_pre, flat.shape[1])
            top_s, top_i = jax.lax.top_k(flat, k)
            anchor_i = top_i // self.num_classes
            label_i = (top_i % self.num_classes).astype(jnp.int32)
            sel_anchor = a[anchor_i]
            sel_reg = jnp.take_along_axis(rg, anchor_i[..., None], axis=1)
            boxes = delta_decode(sel_anchor, sel_reg, stds=self.target_stds)
            h = img_shapes[:, 0][:, None, None]
            w = img_shapes[:, 1][:, None, None]
            x = jnp.clip(boxes[..., 0::2], 0, w)
            y = jnp.clip(boxes[..., 1::2], 0, h)
            boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
            all_s.append(top_s)
            all_b.append(boxes)
            all_l.append(label_i)

        scores = jnp.concatenate(all_s, axis=1)
        boxes = jnp.concatenate(all_b, axis=1)
        labels = jnp.concatenate(all_l, axis=1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        valid = scores > score_thr

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(boxes, scores, labels, valid)


@DETECTORS.register
class FreeAnchorRetinaNet(RetinaNet):
    """FreeAnchor (`mmdet/models/dense_heads/free_anchor_retina_head.py`):
    RetinaNet scores/deltas trained with the maximum-likelihood bag loss —
    per gt a top-`pre_anchor_topk` IoU bag, positive term
    -alpha*log(mean-max(P_cls * P_loc)), negative term a focal penalty on
    cls_prob * (1 - P{anchor in A+}).  Fixed-shape: sparse max over classes
    becomes a segment_max, padded gts carry zero probability.
    """
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    fa_alpha: float = 0.5
    fa_gamma: float = 2.0
    bbox_loss_weight: float = 0.75

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds = self(images, train=True)
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        anchors = jnp.concatenate(
            [jnp.asarray(a) for a in self.anchor_gen.grid_anchors(sizes)], 0)
        B = images.shape[0]
        C = self.num_classes
        cls = jnp.concatenate(
            [c.reshape(B, -1, C) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        cls_prob = jax.nn.sigmoid(cls)
        K = self.pre_anchor_topk
        EPS = 1e-12

        def single(cls_p, reg_p, gts, glabels, gvalid):
            # image_box_prob P{a_j in A+} (N, C), no grad
            dec = jax.lax.stop_gradient(
                delta_decode(anchors, reg_p, stds=self.target_stds))
            iou = bbox_overlaps(gts, dec)                       # (G, N)
            t1 = self.bbox_thr
            t2 = jnp.clip(iou.max(1, keepdims=True), t1 + 1e-12)
            obj_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)
            obj_prob = jnp.where(gvalid[:, None], obj_prob, 0.0)
            seg = jnp.clip(glabels, 0, C - 1)
            box_prob = jnp.maximum(
                jax.ops.segment_max(obj_prob, seg, num_segments=C),
                0.0).T                                          # (N, C)
            box_prob = jax.lax.stop_gradient(box_prob)

            # bags: top-K anchors per gt by anchor IoU
            aiou = bbox_overlaps(gts, anchors)                  # (G, N)
            _, matched = jax.lax.top_k(aiou, K)                 # (G, K)
            mcls = jnp.take_along_axis(
                cls_p[matched],                                 # (G, K, C)
                jnp.clip(glabels, 0, C - 1)[:, None, None].repeat(K, 1),
                axis=-1)[..., 0]                                # (G, K)
            menc = delta_encode(anchors[matched],
                                gts[:, None, :].repeat(K, 1),
                                stds=self.target_stds)
            diff = jnp.abs(reg_p[matched] - jax.lax.stop_gradient(menc))
            beta = 0.11
            sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                            diff - 0.5 * beta).sum(-1)
            mbox = jnp.exp(-self.bbox_loss_weight * sl1)        # (G, K)
            mprob = mcls * mbox
            wgt = 1.0 / jnp.clip(1.0 - mprob, EPS)
            wgt = wgt / wgt.sum(1, keepdims=True)
            bag_prob = (wgt * mprob).sum(1)                     # (G,)
            pos = -self.fa_alpha * jnp.log(jnp.clip(bag_prob, EPS))
            pos = jnp.where(gvalid, pos, 0.0)

            nprob = jnp.clip(cls_p * (1.0 - box_prob), EPS, 1 - EPS)
            neg = ((1 - self.fa_alpha) * nprob ** self.fa_gamma *
                   -jnp.log1p(-nprob)).sum()
            return pos.sum(), neg, gvalid.sum()

        pos, neg, npos = jax.vmap(single)(cls_prob, reg, gt_boxes,
                                          gt_labels, gt_valid)
        n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
        return {"positive_bag_loss": pos.sum() / n,
                "negative_bag_loss": neg.sum() / (n * K)}
