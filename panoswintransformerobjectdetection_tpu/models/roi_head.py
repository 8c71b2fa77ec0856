"""RoI head: FPN-level routing RoIAlign extractor + Shared2FC bbox head +
fixed-shape train/test logic.

Covers the reference's `StandardRoIHead` (`standard_roi_head.py:10`),
`SingleRoIExtractor` (`single_level_roi_extractor.py:9`) and
`Shared2FCBBoxHead` (`convfc_bbox_head.py:177`).  Level routing:
lvl = floor(log2(sqrt(area) / finest_scale + 1e-6)), clamped — computed for
all RoIs at once; RoIAlign runs on every level and a one-hot select keeps
static shapes (4x gather work instead of dynamic partitions — the TPU
tradeoff).
"""

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.bbox import bbox_overlaps, delta_encode, delta_decode
from ..core.assigner import max_iou_assign
from ..core.sampler import random_sample
from ..core import losses
from ..ops.roi_align import roi_align, multilevel_roi_align as _fused_mra
from ..ops.nms import multiclass_nms, DetResult
from .layers import trunc_init
from .registry import HEADS


def multilevel_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         strides: Sequence[int] = (4, 8, 16, 32),
                         out_size: int = 7, finest_scale: int = 56,
                         sampling_ratio: int = 2,
                         block_ordered: bool = True) -> jnp.ndarray:
    """rois: (R, 5) (batch, x1, y1, x2, y2) image coords -> (R, o, o, C).

    Delegates to the interpolation-matrix GEMM implementation in
    ops/roi_align.py.

    `block_ordered` is an explicit caller contract, not inferred from
    divisibility: True promises rois are grouped per image in batch order
    with R = B * P (the in-tree detectors all build them via
    `rois.reshape(B * P, 5)`), enabling the per-image fast path.  Pass
    False for interleaved or arbitrarily ordered rois — the slow path is
    correct for any ordering.
    """
    B = feats[0].shape[0]
    R = rois.shape[0]
    per_image = None
    if block_ordered and R > 0:
        assert R % B == 0, (
            f"block_ordered rois require R % B == 0, got R={R} B={B}; "
            "pass block_ordered=False for arbitrary roi ordering")
        per_image = R // B
    return _fused_mra(list(feats), rois, strides=strides, out_size=out_size,
                      finest_scale=finest_scale, sampling_ratio=sampling_ratio,
                      per_image=per_image)


@HEADS.register
class Shared2FCBBoxHead(nn.Module):
    """flatten -> fc(1024) -> relu -> fc(1024) -> relu -> {cls, reg}."""
    num_classes: int = 80
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    return_feat: bool = False   # also return the shared fc feature (SCNet relay)
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: (R, o, o, C) -> (cls (R, C+1), reg (R, 4C or 4))."""
        from .layers import resolve_dtype
        dt = resolve_dtype(self.dtype)
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        if dt is not None:
            x = x.astype(dt)
        x = nn.relu(nn.Dense(self.fc_out_channels, kernel_init=trunc_init,
                             dtype=dt, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, kernel_init=trunc_init,
                             dtype=dt, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=trunc_init, dtype=dt,
                       name="fc_cls")(x).astype(jnp.float32)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, kernel_init=trunc_init, dtype=dt,
                       name="fc_reg")(x).astype(jnp.float32)
        if self.return_feat:
            return cls, reg, x.astype(jnp.float32)
        return cls, reg


@HEADS.register
class Shared4Conv1FCBBoxHead(nn.Module):
    """4x (3x3 conv + GN + relu) -> flatten -> fc -> {cls, reg}
    (`convfc_bbox_head.py` Shared4Conv1FCBBoxHead, the configs/gn head)."""
    num_classes: int = 80
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    norm_groups: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from .layers import resolve_dtype
        dt = resolve_dtype(self.dtype)
        x = roi_feats
        if dt is not None:
            x = x.astype(dt)
        for i in range(4):
            x = nn.Conv(self.conv_out_channels, (3, 3), padding=1, dtype=dt,
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=self.norm_groups,
                                     name=f"gn{i}")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, kernel_init=trunc_init,
                             dtype=dt, name="shared_fc0")(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=trunc_init, dtype=dt,
                       name="fc_cls")(x).astype(jnp.float32)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, kernel_init=trunc_init, dtype=dt,
                       name="fc_reg")(x).astype(jnp.float32)
        return cls, reg


class DeformRoIPoolPack(nn.Module):
    """Deformable RoI pooling extractor (`mmcv.ops.DeformRoIPoolPack` /
    `ModulatedDeformRoIPoolPack`, configs/dcn *_dpool / *_mdpool): a
    standard RoIAlign pass feeds a zero-initialized offset FC whose
    per-bin (dy, dx) shifts drive a second, deformable pooling pass;
    the modulated variant additionally scales bins by a sigmoid mask."""
    out_size: int = 7
    modulated: bool = False
    gamma: float = 0.1
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, feats, flat_rois, strides=(4, 8, 16, 32)):
        from ..ops.roi_align import multilevel_roi_align, deform_roi_pool
        o = self.out_size
        base = multilevel_roi_align(list(feats), flat_rois, strides=strides,
                                    out_size=o)
        R = base.shape[0]
        x = base.reshape(R, -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="offset_fc0")(x))
        off = nn.Dense(o * o * 2, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="offset_fc1")(x).reshape(R, o, o, 2)
        out = deform_roi_pool(list(feats), flat_rois, off, strides=strides,
                              out_size=o, gamma=self.gamma)
        if self.modulated:
            m = nn.Dense(o * o, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="mask_fc")(x).reshape(R, o, o, 1)
            out = out * jax.nn.sigmoid(m)
        return out


@HEADS.register
class Res5BBoxHead(nn.Module):
    """C4-layout RoI head: ResNet res5 (layer4) applied to 14x14 RoI
    features as the shared head, then global average pool -> {cls, reg}
    (`mmdet/models/roi_heads/shared_heads/res_layer.py` ResLayer +
    `bbox_head.py` BBoxHead with_avg_pool=True, the
    configs/faster_rcnn/*_caffe_c4 recipe)."""
    num_classes: int = 80
    planes: int = 512            # res5 bottleneck planes (-> 2048 out)
    depth_blocks: int = 3        # R-50/101 layer4 depth
    stride: int = 2              # 14x14 RoI -> 7x7
    style: str = "caffe"
    reg_class_agnostic: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from .layers import resolve_dtype
        from .resnet import Bottleneck
        dt = resolve_dtype(self.dtype)
        x = roi_feats
        if dt is not None:
            x = x.astype(dt)
        for j in range(self.depth_blocks):
            x = Bottleneck(self.planes,
                           stride=self.stride if j == 0 else 1,
                           downsample=(j == 0), style=self.style,
                           name=f"res5_{j}")(x)
        x = jnp.mean(x, axis=(1, 2))             # global average pool
        cls = nn.Dense(self.num_classes + 1, kernel_init=trunc_init, dtype=dt,
                       name="fc_cls")(x).astype(jnp.float32)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, kernel_init=trunc_init, dtype=dt,
                       name="fc_reg")(x).astype(jnp.float32)
        return cls, reg


@HEADS.register
class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN head (`double_bbox_head.py`, configs/double_heads):
    a conv branch (residual bottlenecks -> GAP -> fc) predicts regression,
    an fc branch (2 fcs) predicts classification."""
    num_classes: int = 80
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        from .layers import resolve_dtype
        dt = resolve_dtype(self.dtype)
        x = roi_feats
        if dt is not None:
            x = x.astype(dt)
        R = x.shape[0]
        # conv branch: 1x1 expand then residual bottlenecks
        y = nn.Conv(self.conv_out_channels, (1, 1), dtype=dt,
                    name="res_expand")(x)
        for i in range(self.num_convs):
            mid = self.conv_out_channels // 4
            r = nn.relu(nn.Conv(mid, (1, 1), dtype=dt, name=f"res{i}_c1")(y))
            r = nn.relu(nn.Conv(mid, (3, 3), padding=1, dtype=dt,
                                name=f"res{i}_c2")(r))
            r = nn.Conv(self.conv_out_channels, (1, 1), dtype=dt,
                        name=f"res{i}_c3")(r)
            y = nn.relu(y + r)
        y = y.mean(axis=(1, 2))                       # GAP
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, kernel_init=trunc_init, dtype=dt,
                       name="fc_reg")(y).astype(jnp.float32)
        # fc branch
        z = x.reshape(R, -1)
        for i in range(self.num_fcs):
            z = nn.relu(nn.Dense(self.fc_out_channels, kernel_init=trunc_init,
                                 dtype=dt, name=f"cls_fc{i}")(z))
        cls = nn.Dense(self.num_classes + 1, kernel_init=trunc_init, dtype=dt,
                       name="fc_cls")(z).astype(jnp.float32)
        return cls, reg


class RoISamples(NamedTuple):
    rois: jnp.ndarray          # (B, S, 5) sampled rois (batch idx in col 0)
    labels: jnp.ndarray        # (B, S) int — class or num_classes for bg
    label_weights: jnp.ndarray # (B, S)
    bbox_targets: jnp.ndarray  # (B, S, 4)
    bbox_weights: jnp.ndarray  # (B, S)


def sample_rois_for_training(rng, proposals, prop_mask, gt_boxes, gt_labels,
                             gt_valid, num_classes,
                             *, pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                             num_samples=512, pos_fraction=0.25,
                             target_means=(0., 0., 0., 0.),
                             target_stds=(0.1, 0.1, 0.2, 0.2),
                             sampler="random") -> RoISamples:
    """Assign + sample RCNN rois per image (gt boxes appended as proposals,
    `RandomSampler add_gt_as_proposals`).  Fixed output: pos_cap + num slots.

    sampler: "random" (default) or a dict for CombinedSampler semantics —
    ``{"pos_sampler": "instance_balanced"|"random",
    "neg_sampler": "iou_balanced"|"random", ...bin params}`` (the Libra
    R-CNN recipe, `configs/libra_rcnn/*`).
    """
    B, P, _ = proposals.shape
    G = gt_boxes.shape[1]
    pos_cap = int(num_samples * pos_fraction)

    def single(rng_i, props, pmask, gts, glabels, gvalid, bidx):
        cand = jnp.concatenate([gts, props], axis=0)           # (G+P, 4)
        cand_valid = jnp.concatenate([gvalid, pmask], axis=0)
        ious = bbox_overlaps(gts, cand)                        # (G, G+P)
        ious = jnp.where(cand_valid[None, :], ious, -1.0)
        assigned, _ = max_iou_assign(ious, gvalid, pos_iou_thr, neg_iou_thr,
                                     min_pos_iou, match_low_quality=False)
        assigned = jnp.where(cand_valid, assigned, -1)
        if isinstance(sampler, dict):
            from ..core.sampler import combined_sample
            max_ious = jnp.max(jnp.where(gvalid[:, None], ious, 0.0), axis=0)
            s = combined_sample(rng_i, assigned, max_ious, num_samples,
                                pos_fraction, **sampler)
        else:
            s = random_sample(rng_i, assigned, num_samples, pos_fraction)

        inds = jnp.concatenate([s.pos_inds, s.neg_inds])       # (pos_cap+num,)
        pos_m = jnp.concatenate([s.pos_mask, jnp.zeros_like(s.neg_mask)])
        sel_m = jnp.concatenate([s.pos_mask, s.neg_mask])

        boxes = cand[inds]
        a = assigned[inds]
        gt_idx = jnp.clip(a - 1, 0)
        labels = jnp.where(pos_m, glabels[gt_idx], num_classes)
        targets = jax.lax.stop_gradient(
            delta_encode(boxes, gts[gt_idx], target_means, target_stds))
        targets = jnp.where(pos_m[:, None], targets, 0.0)
        rois = jnp.concatenate(
            [jnp.full((boxes.shape[0], 1), bidx, boxes.dtype), boxes], axis=1)
        return rois, labels, sel_m.astype(jnp.float32), targets, pos_m.astype(jnp.float32)

    rngs = jax.random.split(rng, B)
    bidx = jnp.arange(B, dtype=proposals.dtype)
    rois, labels, lw, bt, bw = jax.vmap(single)(
        rngs, proposals, prop_mask, gt_boxes, gt_labels, gt_valid, bidx)
    return RoISamples(rois, labels, lw, bt, bw)


def score_hlr_reweight(rng, cls_logits, bbox_pred, samples: RoISamples,
                       num_classes, num_expected, *,
                       target_stds=(0.1, 0.1, 0.2, 0.2), k=0.5, bias=0.0,
                       score_thr=0.05, iou_thr=0.5,
                       reg_class_agnostic=False) -> jnp.ndarray:
    """ScoreHLRSampler negative selection + reweighting
    (`mmdet/core/bbox/samplers/score_hlr_sampler.py:99-213`, PISA ISR-N).

    The reference runs the bbox head on all negatives inside the sampler;
    here the detector draws a 2x random pool (the OHEM pattern) and this
    post-head pass picks `num_expected` negatives and maps their
    Score-HLR to label weights: negatives scoring above `score_thr` are
    grouped by NMS-match on their decoded boxes, ranked by
    ``num_valid - group_rank + score``, weighted
    ``(bias + (1-bias)*(up - rank)/up)**k`` and loss-sum-normalized;
    below-threshold negatives fill the remainder at the minimum weight.

    Returns the updated label_weights (B, S).
    """
    from ..core.bbox import delta_decode
    from ..ops.nms import nms_match

    B, S = samples.labels.shape
    logits = jax.lax.stop_gradient(cls_logits).reshape(B, S, -1)
    probs = jax.nn.softmax(logits, axis=-1)
    max_score = probs[..., :num_classes].max(-1)                # fg only
    arg = probs[..., :num_classes].argmax(-1)
    reg = jax.lax.stop_gradient(bbox_pred).reshape(B, S, -1)
    if reg_class_agnostic:
        pred4 = reg
    else:
        pred4 = jnp.take_along_axis(
            reg.reshape(B, S, num_classes, 4),
            arg[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    boxes = delta_decode(samples.rois[..., 1:].reshape(-1, 4),
                         pred4.reshape(-1, 4), stds=target_stds)
    # per-image coordinate offset: boxes of different images never match
    off = (jnp.arange(B, dtype=boxes.dtype) * 1e5)[:, None].repeat(S, 1)
    flat_boxes = boxes + off.reshape(-1, 1)
    flat_score = max_score.reshape(-1)

    neg = ((samples.labels == num_classes) &
           (samples.label_weights > 0)).reshape(-1)
    valid = neg & (flat_score > score_thr)
    _, grank, _ = nms_match(flat_boxes, flat_score, iou_thr, valid)
    num_valid = valid.sum()

    imp = jnp.where(valid, num_valid - grank + flat_score, -jnp.inf)
    imp_rank = ((imp[None, :] > imp[:, None]) & valid[None, :]).sum(-1)

    # selection order: valid negs by importance, then invalid negs random
    N = B * S
    u = jax.random.uniform(rng, (N,))
    sel_key = jnp.where(valid, 3.0 + (N - imp_rank) / N,
                        jnp.where(neg, u, -1.0))
    sel_rank = (sel_key[None, :] > sel_key[:, None]).sum(-1)
    selected = neg & (sel_rank < num_expected)

    up = jnp.maximum(num_expected, num_valid).astype(jnp.float32)
    w_valid = (bias + (1.0 - bias) * (up - imp_rank) / up) ** k
    num_hlr = jnp.minimum(num_valid, num_expected)
    w_min = (bias + (1.0 - bias) *
             (up - jnp.maximum(num_hlr - 1, 0)) / up) ** k
    w = jnp.where(valid & selected, w_valid,
                  jnp.where(selected, w_min, 0.0))
    w = jnp.where(num_valid > 0, w, selected.astype(jnp.float32))

    # preserve the total negative CE (`score_hlr_sampler.py:205-208`)
    nll = -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1).reshape(N, -1),
        jnp.full((N, 1), num_classes), axis=1)[:, 0]
    sel_f = selected.astype(jnp.float32)
    ratio = (nll * sel_f).sum() / jnp.maximum((nll * w).sum(), 1e-6)
    w = w * ratio

    return jnp.where(neg.reshape(B, S), w.reshape(B, S),
                     samples.label_weights)


def bbox_head_loss(cls_logits, bbox_pred, samples: RoISamples, num_classes,
                   reg_class_agnostic=False,
                   pisa=None, reg_loss="l1", reg_loss_weight=1.0,
                   target_stds=(0.1, 0.1, 0.2, 0.2)) -> Dict[str, jnp.ndarray]:
    """Softmax CE + L1 on positive rows (`bbox_head.py` loss semantics).

    pisa: optional dict (configs/pisa) enabling ISR-P importance
    reweighting of the regression loss and the CARL classification-aware
    term (`pisa_loss.py isr_p / carl_loss`); keys: isr_k, isr_bias,
    carl_k, carl_bias.

    reg_loss: "l1" (default) or a box-IoU loss ("giou" / "iou" /
    "bounded_iou", the configs/faster_rcnn/*_{giou,iou,bounded_iou}
    recipes) computed on decoded boxes; `target_stds` decodes both the
    prediction and the stored target deltas.
    """
    B, S = samples.labels.shape
    cls_logits = cls_logits.reshape(B, S, -1)
    bbox_pred = bbox_pred.reshape(B, S, -1)
    num_sampled = samples.label_weights.sum()

    loss_cls = losses.cross_entropy(cls_logits, samples.labels,
                                    weight=samples.label_weights,
                                    avg_factor=num_sampled)
    acc = losses.accuracy(cls_logits, samples.labels, samples.label_weights)

    if reg_class_agnostic:
        pred = bbox_pred
    else:
        lab = jnp.clip(samples.labels, 0, num_classes - 1)
        pred = bbox_pred.reshape(B, S, num_classes, 4)
        pred = jnp.take_along_axis(pred, lab[..., None, None].repeat(4, -1),
                                   axis=2)[:, :, 0]
    reg_w = samples.bbox_weights
    out = {}
    if pisa:
        from ..core.bbox import delta_decode
        pos = (samples.bbox_weights > 0).astype(jnp.float32)
        # assigned IoU recovered from the stored deltas: the matched gt box
        # is decode(roi, target) with the rcnn encode stds
        roi_boxes = samples.rois[..., 1:].reshape(-1, 4)
        gt_boxes = delta_decode(roi_boxes, samples.bbox_targets.reshape(-1, 4),
                                stds=pisa.get("target_stds",
                                              (0.1, 0.1, 0.2, 0.2)))
        lt = jnp.maximum(roi_boxes[:, :2], gt_boxes[:, :2])
        rb = jnp.minimum(roi_boxes[:, 2:], gt_boxes[:, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        area = lambda b: jnp.clip(b[:, 2] - b[:, 0], 0, None) * \
            jnp.clip(b[:, 3] - b[:, 1], 0, None)
        ious = (inter / jnp.maximum(area(roi_boxes) + area(gt_boxes) - inter,
                                    1e-6)).reshape(B, S)
        isr = losses.isr_weights(ious.reshape(-1), pos.reshape(-1),
                                 k=pisa.get("isr_k", 2.0),
                                 bias=pisa.get("isr_bias", 0.0)).reshape(B, S)
        reg_w = reg_w * isr
        carl = losses.carl_weights(cls_logits, samples.labels, pos,
                                   num_classes, k=pisa.get("carl_k", 1.0),
                                   bias=pisa.get("carl_bias", 0.2))
        out["loss_carl"] = losses.l1_loss(
            pred, samples.bbox_targets,
            weight=(carl * pos)[..., None], avg_factor=num_sampled) * \
            pisa.get("carl_weight", 1.0)
    if reg_loss == "l1":
        loss_bbox = losses.l1_loss(pred, samples.bbox_targets,
                                   weight=reg_w[..., None],
                                   avg_factor=num_sampled)
    elif reg_loss == "balanced_l1":
        # Libra R-CNN rcnn head (`configs/libra_rcnn/*` BalancedL1Loss)
        loss_bbox = losses.balanced_l1_loss(
            pred, samples.bbox_targets, weight=reg_w[..., None],
            avg_factor=num_sampled) * reg_loss_weight
    else:
        from ..core.bbox import delta_decode
        rois_flat = samples.rois[..., 1:]
        pred_boxes = delta_decode(rois_flat, pred, stds=target_stds)
        tgt_boxes = delta_decode(rois_flat, samples.bbox_targets,
                                 stds=target_stds)
        if reg_loss == "giou":
            loss_bbox = losses.giou_loss(pred_boxes, tgt_boxes,
                                         weight=reg_w, avg_factor=num_sampled)
        elif reg_loss == "bounded_iou":
            from .guided_anchor import bounded_iou_loss
            lb = bounded_iou_loss(
                pred_boxes[..., 2:] - pred_boxes[..., :2],
                tgt_boxes[..., 2:] - tgt_boxes[..., :2])
            loss_bbox = (lb * reg_w).sum() / jnp.maximum(num_sampled, 1.0)
        else:
            loss_bbox = losses.iou_loss(pred_boxes, tgt_boxes,
                                        weight=reg_w, avg_factor=num_sampled)
        loss_bbox = loss_bbox * reg_loss_weight
    out.update({"loss_cls": loss_cls, "loss_bbox": loss_bbox, "acc": acc})
    return out


def bbox_head_detections(cls_logits, bbox_pred, rois, img_shapes, num_classes,
                         *, score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                         target_means=(0., 0., 0., 0.),
                         target_stds=(0.1, 0.1, 0.2, 0.2),
                         roi_mask=None, scale_factors=None,
                         nms_type="nms", score_factors=None) -> DetResult:
    """Decode per-class boxes and run multiclass NMS per image
    (`bbox_head.py get_bboxes` + `multiclass_nms`).

    cls_logits: (B, P, C+1); bbox_pred: (B, P, 4C); rois: (B, P, 5).
    scale_factors: (B, 4) to rescale boxes back to original image coords.
    score_factors: (B, P) per-roi score multiplier applied after softmax
    (`multiclass_nms` score_factors — SABL bucketing-guided rescoring).
    """
    B, P, _ = cls_logits.shape
    scores = jax.nn.softmax(cls_logits, axis=-1)
    if score_factors is not None:
        scores = scores * score_factors[..., None]
    boxes = delta_decode(rois[..., 1:5], bbox_pred, target_means, target_stds)
    # per-image clip of ALL k per-class boxes (the previous stack kept only
    # class 0's box, collapsing class-specific regression — caught by
    # tests/test_e2e_reference_parity.py)
    k = boxes.shape[-1] // 4
    b4 = boxes.reshape(B, P, k, 4)
    h = img_shapes[:, 0][:, None, None]
    w = img_shapes[:, 1][:, None, None]
    boxes = jnp.stack([jnp.clip(b4[..., 0], 0, w),
                       jnp.clip(b4[..., 1], 0, h),
                       jnp.clip(b4[..., 2], 0, w),
                       jnp.clip(b4[..., 3], 0, h)], -1).reshape(B, P, 4 * k)
    if scale_factors is not None:
        k = boxes.shape[-1] // 4
        boxes = boxes / jnp.tile(scale_factors, (1, k))[:, None, :]

    def single(b, s, m):
        return multiclass_nms(b, s, score_thr, iou_threshold, max_per_img,
                              valid=m, nms_type=nms_type)

    mask = roi_mask if roi_mask is not None else jnp.ones((B, P), bool)
    return jax.vmap(single)(boxes, scores, mask)
