"""RPN head: conv tower + batched fixed-shape target/proposal machinery.

Covers the reference's `PanoRPNHead` (`mmdet/models/dense_heads/panorpn_head.py:17`)
= stock RPN (`rpn_head.py:17`) with batch-capable `_get_bboxes`, plus the
`AnchorHead` target pipeline (`anchor_head.py:15`).  The conv tower is a
flax module; targets/loss/proposals are pure jit functions vmapped over the
batch — no per-image Python loops.
"""

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.anchors import AnchorGenerator
from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..core.assigner import max_iou_assign
from ..core.sampler import random_sample
from ..core import losses
from ..ops.nms import nms, batched_nms, NEG_INF
from .registry import HEADS


@HEADS.register
class RPNHead(nn.Module):
    """3x3 shared conv -> 1x1 objectness + 1x1 deltas per anchor
    (`panorpn_head.py:41 forward_single`)."""
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]):
        from .layers import resolve_dtype
        dt = resolve_dtype(self.dtype)
        cls_out, reg_out = [], []
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt, name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=dt, name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=dt, name="rpn_reg")
        for f in feats:
            t = nn.relu(conv(f if dt is None else f.astype(dt)))
            # decode/NMS numerics stay f32
            cls_out.append(cls(t).astype(jnp.float32))
            reg_out.append(reg(t).astype(jnp.float32))
        return tuple(cls_out), tuple(reg_out)


# PanoRPNHead is the batched-inference variant of RPNHead in the reference;
# the TPU rewrite is batched by construction, so it is an alias.
HEADS.register(RPNHead, name="PanoRPNHead")


def flatten_levels(cls_scores, bbox_preds):
    """Per-level NHW(A[,4]) maps -> (B, N, .) concatenated over levels."""
    B = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in cls_scores], axis=1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in bbox_preds], axis=1)
    return cls_flat, reg_flat


def rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes, gt_valid, rng,
             *, pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
             num_samples=256, pos_fraction=0.5, neg_pos_ub=-1,
             target_means=(0., 0., 0., 0.), target_stds=(1., 1., 1., 1.),
             loss_cls_weight=1.0, loss_bbox_weight=1.0) -> Dict[str, jnp.ndarray]:
    """Anchor-target assembly + sigmoid CE / L1 (`anchor_head.py` loss path).

    anchors: (N, 4) all levels; gt_boxes: (B, G, 4); gt_valid: (B, G).
    """
    cls_flat, reg_flat = flatten_levels(cls_scores, bbox_preds)
    B, N = cls_flat.shape

    def single(rng_i, gts, gvalid):
        ious = bbox_overlaps(gts, anchors)                     # (G, N)
        assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr, neg_iou_thr,
                                     min_pos_iou, match_low_quality=True)
        s = random_sample(rng_i, assigned, num_samples, pos_fraction,
                          neg_pos_ub=neg_pos_ub)
        gt_idx = jnp.clip(assigned[s.pos_inds] - 1, 0)
        pos_anchors = anchors[s.pos_inds]
        # targets are constants w.r.t. the network (mmdet builds them in
        # no_grad target assembly)
        pos_targets = jax.lax.stop_gradient(
            delta_encode(pos_anchors, gts[gt_idx], target_means, target_stds))
        return s, pos_targets

    rngs = jax.random.split(rng, B)
    samples, pos_targets = jax.vmap(single)(rngs, gt_boxes, gt_valid)

    pos_w = samples.pos_mask.astype(jnp.float32)               # (B, Pc)
    neg_w = samples.neg_mask.astype(jnp.float32)               # (B, S)
    num_total = pos_w.sum() + neg_w.sum()

    pos_logits = jnp.take_along_axis(cls_flat, samples.pos_inds, axis=1)
    neg_logits = jnp.take_along_axis(cls_flat, samples.neg_inds, axis=1)
    loss_cls = (losses.binary_cross_entropy(pos_logits, jnp.ones_like(pos_logits),
                                            weight=pos_w, avg_factor=num_total) +
                losses.binary_cross_entropy(neg_logits, jnp.zeros_like(neg_logits),
                                            weight=neg_w, avg_factor=num_total))

    pos_deltas = jnp.take_along_axis(reg_flat, samples.pos_inds[..., None], axis=1)
    # mmdet sums the elementwise |diff| over the 4 coords and divides by the
    # number of sampled anchors (avg_factor=num_total_samples)
    loss_bbox = losses.l1_loss(pos_deltas, pos_targets,
                               weight=pos_w[..., None],
                               avg_factor=num_total)
    return {"loss_rpn_cls": loss_cls * loss_cls_weight,
            "loss_rpn_bbox": loss_bbox * loss_bbox_weight}


class Proposals(NamedTuple):
    boxes: jnp.ndarray    # (B, P, 4)
    scores: jnp.ndarray   # (B, P)
    mask: jnp.ndarray     # (B, P) bool


def rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                  *, nms_pre=1000, max_per_img=1000, iou_threshold=0.7,
                  min_bbox_size=0,
                  target_means=(0., 0., 0., 0.),
                  target_stds=(1., 1., 1., 1.)) -> Proposals:
    """Batched proposal generation (`panorpn_head.py:89 _get_bboxes`):
    per-level top-k by objectness -> decode -> level-wise batched NMS.

    img_shapes: (B, 2) dynamic (h, w) used for box clipping.
    """
    B = cls_scores[0].shape[0]

    lvl_scores, lvl_boxes, lvl_ids = [], [], []
    for lv, (c, r, a) in enumerate(zip(cls_scores, bbox_preds, level_anchors)):
        sc = jax.nn.sigmoid(c.reshape(B, -1))                  # (B, n)
        rg = r.reshape(B, -1, 4)
        n = sc.shape[1]
        k = min(nms_pre, n)
        top_sc, top_i = jax.lax.top_k(sc, k)
        top_rg = jnp.take_along_axis(rg, top_i[..., None], axis=1)
        top_anchor = a[top_i]                                  # (B, k, 4)
        boxes = delta_decode(top_anchor, top_rg, target_means, target_stds)
        # clip to per-image shape
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        lvl_scores.append(top_sc)
        lvl_boxes.append(boxes)
        lvl_ids.append(jnp.full((B, k), lv, jnp.int32))

    # Level-wise NMS (mmdet batched_nms with level ids => no cross-level
    # suppression) is run as independent per-(image, level) NMS, vmapped —
    # shorter candidate lists and full parallelism across levels.
    kmax = max(sc.shape[1] for sc in lvl_scores)

    def padk(x, fill):
        k = x.shape[1]
        if k == kmax:
            return x
        pad_width = ((0, 0), (0, kmax - k)) + ((0, 0),) * (x.ndim - 2)
        return jnp.pad(x, pad_width, constant_values=fill)

    scores_l = jnp.stack([padk(s, NEG_INF) for s in lvl_scores])   # (L, B, k)
    boxes_l = jnp.stack([padk(b, 0.0) for b in lvl_boxes])         # (L, B, k, 4)
    L = scores_l.shape[0]
    valid_l = scores_l > NEG_INF / 2
    if min_bbox_size > 0:
        wh_ok = ((boxes_l[..., 2] - boxes_l[..., 0]) > min_bbox_size) & \
                ((boxes_l[..., 3] - boxes_l[..., 1]) > min_bbox_size)
        valid_l = valid_l & wh_ok

    keep_out = min(max_per_img, kmax)

    def one(b, s, v):
        r = nms(b, s, iou_threshold, keep_out, v)
        return r.boxes, r.scores, r.mask

    flat = jax.vmap(one)
    pb, ps, pm = flat(boxes_l.reshape(L * B, kmax, 4),
                      scores_l.reshape(L * B, kmax),
                      valid_l.reshape(L * B, kmax))
    # union across levels per image, top max_per_img by score
    pb = pb.reshape(L, B, keep_out, 4).transpose(1, 0, 2, 3).reshape(B, -1, 4)
    ps = ps.reshape(L, B, keep_out).transpose(1, 0, 2).reshape(B, -1)
    pm = pm.reshape(L, B, keep_out).transpose(1, 0, 2).reshape(B, -1)
    ps = jnp.where(pm, ps, NEG_INF)
    top_s, top_i = jax.lax.top_k(ps, min(max_per_img, ps.shape[1]))
    top_b = jnp.take_along_axis(pb, top_i[..., None], axis=1)
    top_m = top_s > NEG_INF / 2
    return Proposals(top_b, jnp.where(top_m, top_s, 0.0), top_m)
