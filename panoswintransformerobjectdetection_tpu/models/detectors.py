"""Two-stage detectors: Faster R-CNN family, pano variant.

Covers the reference's `TwoStageDetector` (`two_stage.py`), `FasterRCNN`
(`faster_rcnn.py`) and `PanoFasterRCNN` (`panofaster_rcnn.py:8`).  A single
flax module orchestrates backbone -> FPN -> RPN -> RoI head with three
entry methods:

  __call__       : init/trace path touching every submodule's params
  forward_train  : batched losses dict (`forward_train:61` analogue)
  simple_test    : batched padded detections (`simple_test:169` analogue)

All batch logic is fixed-shape + vmapped; the sampler randomness comes from
the flax 'sampler' rng stream.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.anchors import AnchorGenerator
from ..core.bbox import bbox_overlaps
from .registry import BACKBONES, NECKS, DETECTORS, build
from .rpn_head import RPNHead, rpn_loss, rpn_proposals, Proposals
from .roi_head import (
    Shared2FCBBoxHead, multilevel_roi_align, sample_rois_for_training,
    bbox_head_loss, bbox_head_detections,
)
from .mask_head import (
    FCNMaskHead, mask_targets_from_bitmaps, mask_head_loss, paste_masks,
    MaskIoUHead, mask_iou_targets, mask_iou_loss,
)
from ..ops.nms import DetResult, NEG_INF


def default_train_cfg() -> dict:
    """`configs/_base_/models/faster_rcnn_panoswin_fpn.py:64-101`."""
    return {
        "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                "num_samples": 256, "pos_fraction": 0.5},
        "rpn_proposal": {"nms_pre": 2000, "max_per_img": 1000,
                         "iou_threshold": 0.7, "min_bbox_size": 0},
        "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
                 "num_samples": 512, "pos_fraction": 0.25},
    }


def default_test_cfg() -> dict:
    """`configs/_base_/models/faster_rcnn_panoswin_fpn.py:102-115`."""
    return {
        "rpn": {"nms_pre": 1000, "max_per_img": 1000, "iou_threshold": 0.7,
                "min_bbox_size": 0},
        "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5, "max_per_img": 100},
    }


class NeckChain(nn.Module):
    """Sequential neck composition (Libra R-CNN's FPN -> BFP; mmdet builds
    list-valued `neck` configs as nn.Sequential)."""
    cfgs: Tuple[Any, ...]

    def setup(self):
        self.neck_list = [build(NECKS, dict(c)) for c in self.cfgs]

    def __call__(self, feats):
        for m in self.neck_list:
            feats = m(feats)
        return feats


@DETECTORS.register
class TwoStageDetector(nn.Module):
    backbone: Any                    # config dict with 'type'
    num_classes: int = 80
    neck: Optional[Any] = None       # config dict; default FPN
    anchor_scales: Tuple[float, ...] = (8.0,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    rcnn_target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    with_mask: bool = False
    mask_roi_size: int = 14
    # bbox RoI crop size (14 for the C4 layout's Res5BBoxHead)
    bbox_roi_size: int = 7
    compute_dtype: Any = None   # e.g. "bfloat16": MXU-friendly mixed precision
    # PISA (configs/pisa): ISR-P + CARL on the RoI losses; dict of
    # isr_k/isr_bias/carl_k/carl_bias/carl_weight or None
    pisa: Optional[dict] = None
    # optional bbox-head override, e.g. {"type": "DoubleConvFCBBoxHead"}
    # (configs/double_heads) or {"type": "Shared4Conv1FCBBoxHead"}
    # (configs/gn); None keeps Shared2FC
    bbox_head: Optional[dict] = None
    # "generic" pools every RoI from EVERY pyramid level and sums
    # (GRoIE, configs/groie); "dpool"/"mdpool" use (modulated) deformable
    # RoI pooling (configs/dcn); None keeps the level-routed extractor
    roi_extractor: Optional[str] = None
    # RoIAlign samples per bin side: 2 = fixed grid (Detectron2 choice,
    # the TPU default — static work per roi); 0 = mmcv's adaptive
    # ceil(bin) grid, exact vs the reference CUDA kernel (used by the
    # golden e2e parity tests; see ops/roi_align.py)
    roi_sampling_ratio: int = 2

    def _roi_extract(self, feats, flat_rois, out_size: Optional[int] = None):
        if out_size is None:
            out_size = self.bbox_roi_size
        if self.roi_extractor == "generic":
            from ..ops.roi_align import generic_roi_align
            return generic_roi_align(feats[:4], flat_rois,
                                     strides=self.featmap_strides,
                                     out_size=out_size,
                                     sampling_ratio=self.roi_sampling_ratio)
        if self.roi_extractor in ("dpool", "mdpool") and \
                out_size == self.bbox_roi_size:
            # deformable pooling applies to the bbox extractor only
            # (mmdet keeps the mask extractor standard)
            return self.roi_extract_m(feats[:4], flat_rois,
                                      strides=self.featmap_strides)
        nlvl = min(len(self.featmap_strides), len(feats))
        return multilevel_roi_align(feats[:nlvl], flat_rois,
                                    strides=self.featmap_strides,
                                    out_size=out_size,
                                    sampling_ratio=self.roi_sampling_ratio)

    def _default_bbox_head(self):
        """Subclass hook: the head config used when `bbox_head` is unset."""
        return None

    def setup(self):
        bb_cfg = dict(self.backbone)
        if self.compute_dtype is not None:
            bb_cfg.setdefault("dtype", self.compute_dtype)
        self.backbone_m = build(BACKBONES, bb_cfg)
        neck_cfg = self.neck or {"type": "FPN",
                                 "in_channels": (96, 192, 384, 768),
                                 "out_channels": 256, "num_outs": 5}
        # a list/tuple of neck configs chains them (Libra R-CNN FPN -> BFP,
        # `mmdet/models/detectors/two_stage.py` builds necks via Sequential)
        neck_cfgs = list(neck_cfg) if isinstance(neck_cfg, (list, tuple)) \
            else [dict(neck_cfg)]
        if self.compute_dtype is not None:
            neck_cfgs = [dict(c) for c in neck_cfgs]
            for c in neck_cfgs:
                c.setdefault("dtype", self.compute_dtype)
        if len(neck_cfgs) == 1:
            self.neck_m = build(NECKS, neck_cfgs[0])
        else:
            self.neck_m = NeckChain(cfgs=tuple(neck_cfgs), name="neck_chain")
        self.rpn_m = RPNHead(
            num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
            dtype=self.compute_dtype)
        head_cfg = self.bbox_head or self._default_bbox_head()
        if head_cfg is not None:
            from .registry import HEADS
            hc = dict(head_cfg)
            hc.setdefault("num_classes", self.num_classes)
            if self.compute_dtype is not None:
                hc.setdefault("dtype", self.compute_dtype)
            self.bbox_head_m = build(HEADS, hc)
        else:
            self.bbox_head_m = Shared2FCBBoxHead(num_classes=self.num_classes,
                                                 dtype=self.compute_dtype)
        if self.with_mask:
            self.mask_head_m = FCNMaskHead(num_classes=self.num_classes)
        if self.roi_extractor in ("dpool", "mdpool"):
            from .roi_head import DeformRoIPoolPack
            self.roi_extract_m = DeformRoIPoolPack(
                out_size=self.bbox_roi_size,
                modulated=self.roi_extractor == "mdpool")
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=self.anchor_ratios,
            scales=self.anchor_scales)

    # ---------------------------------------------------------------- utils
    def extract_feat(self, images, train=False, pano_ratio_v=None):
        """`PanoFasterRCNN.extract_feat:34`: the pano detector threads
        pano_ratio_v into the backbone (only the V2 backbone consumes it)."""
        takes_ratio = type(self.backbone_m).__name__ == "PanoSwinTransformerV2"
        if pano_ratio_v is not None and takes_ratio:
            feats = self.backbone_m(images, pano_ratio_v=pano_ratio_v,
                                    train=train)
        else:
            feats = self.backbone_m(images, train=train)
        return self.neck_m(feats)

    def _anchors(self, cls_scores):
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = [jnp.asarray(a) for a in self.anchor_gen.grid_anchors(sizes)]
        return per_level, jnp.concatenate(per_level, axis=0)

    # ----------------------------------------------------------- init trace
    def __call__(self, images, train: bool = False):
        """Touches every parameter (used for init and compile checks)."""
        feats = self.extract_feat(images, train=train)
        cls_scores, bbox_preds = self.rpn_m(feats)
        B = images.shape[0]
        dummy_rois = jnp.tile(
            jnp.array([[0.0, 0.0, 0.0, 32.0, 32.0]], images.dtype), (B, 1))
        dummy_rois = dummy_rois.at[:, 0].set(jnp.arange(B, dtype=images.dtype))
        roi_feats = self._roi_extract(feats, dummy_rois)
        cls, reg = self.bbox_head_m(roi_feats)
        if self.with_mask:
            mfeats = self._roi_extract(feats, dummy_rois,
                                       out_size=self.mask_roi_size)
            mlogits = self.mask_head_m(mfeats)
            self._init_extra_mask(mfeats, mlogits)
        return feats, (cls_scores, bbox_preds), (cls, reg)

    def _init_extra_mask(self, mfeats, mlogits):
        """Init-trace hook for subclasses with extra mask-branch modules."""

    # -------------------------------------------------------------- training
    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None,
                      pano_ratio_v=None) -> Dict[str, jnp.ndarray]:
        """images: (B, H, W, 3); img_shapes: (B, 2) unpadded (h, w);
        gt_boxes: (B, G, 4) xyxy; gt_labels: (B, G); gt_valid: (B, G)."""
        tc = self.train_cfg or default_train_cfg()
        feats = self.extract_feat(images, train=True, pano_ratio_v=pano_ratio_v)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, anchors = self._anchors(cls_scores)

        rng = self.make_rng("sampler")
        rng_rpn, rng_rcnn = jax.random.split(rng)

        losses_out = rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes,
                              gt_valid, rng_rpn,
                              target_stds=self.rpn_target_stds, **tc["rpn"])

        # proposals are constants for the RoI stage: RPN receives gradient
        # only through rpn_loss (mmdet semantics — roi coords are
        # non-differentiable in the CUDA RoIAlign, targets built in no_grad)
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            rpn_proposals(cls_scores, bbox_preds, level_anchors,
                          img_shapes, target_stds=self.rpn_target_stds,
                          **tc["rpn_proposal"]))

        rcnn_cfg = dict(tc["rcnn"])
        sampler_kind = rcnn_cfg.pop("sampler", "random")
        reg_loss = rcnn_cfg.pop("reg_loss", "l1")
        reg_loss_weight = rcnn_cfg.pop("reg_loss_weight", 1.0)
        score_hlr_cfg = None
        if sampler_kind == "ohem":
            # OHEM (`samplers/ohem_sampler.py` role, fixed-shape variant):
            # draw a 2x random pool, then keep only the hardest half of the
            # negatives by current head CE loss via weight masking
            rcnn_cfg["num_samples"] = rcnn_cfg.get("num_samples", 512) * 2
        elif sampler_kind == "score_hlr" or (
                isinstance(sampler_kind, dict)
                and sampler_kind.get("type") == "score_hlr"):
            # ScoreHLRSampler (PISA ISR-N): 2x random pool, negatives
            # re-picked and re-weighted post-head by score_hlr_reweight
            score_hlr_cfg = dict(sampler_kind) if isinstance(
                sampler_kind, dict) else {}
            score_hlr_cfg.pop("type", None)
            rcnn_cfg["num_samples"] = rcnn_cfg.get("num_samples", 512) * 2
        elif isinstance(sampler_kind, dict):
            # CombinedSampler (Libra): pos/neg sampler dict passed through
            rcnn_cfg["sampler"] = sampler_kind
        samples = sample_rois_for_training(
            rng_rcnn, props.boxes, props.mask, gt_boxes, gt_labels, gt_valid,
            self.num_classes, target_stds=self.rcnn_target_stds, **rcnn_cfg)

        B, S, _ = samples.rois.shape
        flat_rois = samples.rois.reshape(B * S, 5)
        roi_feats = self._roi_extract(feats, flat_rois)
        cls, reg = self.bbox_head_m(roi_feats)
        if sampler_kind == "ohem":
            logp = jax.nn.log_softmax(
                jax.lax.stop_gradient(cls.reshape(B, S, -1)), -1)
            nll = -jnp.take_along_axis(logp, samples.labels[..., None],
                                       -1)[..., 0]
            neg = (samples.labels == self.num_classes) & \
                (samples.label_weights > 0)
            neg_loss = jnp.where(neg, nll, -jnp.inf).reshape(-1)
            n_keep = (neg.sum() + 1) // 2
            order = jnp.argsort(-neg_loss)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            keep = (rank.reshape(B, S) < n_keep) & neg
            new_lw = jnp.where(neg & ~keep, 0.0, samples.label_weights)
            samples = samples._replace(label_weights=new_lw)
        elif score_hlr_cfg is not None:
            from .roi_head import score_hlr_reweight
            n_pos = (samples.bbox_weights > 0).sum()
            num_expected = jnp.maximum(
                rcnn_cfg.get("num_samples", 1024) // 2 - n_pos, 1)
            new_lw = score_hlr_reweight(
                jax.random.fold_in(rng_rcnn, 1), cls, reg, samples,
                self.num_classes, num_expected,
                target_stds=self.rcnn_target_stds, **score_hlr_cfg)
            samples = samples._replace(label_weights=new_lw)
        losses_out.update(bbox_head_loss(cls, reg, samples, self.num_classes,
                                         pisa=self.pisa, reg_loss=reg_loss,
                                         reg_loss_weight=reg_loss_weight,
                                         target_stds=self.rcnn_target_stds))

        if self.with_mask and gt_masks is not None:
            mask_out = self._mask_train_outputs(
                feats, samples, gt_masks, gt_boxes, gt_valid, tc)
            losses_out["loss_mask"] = mask_out["loss_mask"]
            self._extra_mask_losses(losses_out, mask_out)
        return losses_out

    def _mask_train_outputs(self, feats, samples, gt_masks, gt_boxes,
                            gt_valid, tc):
        """Mask branch forward + targets over positive samples; returns the
        pieces subclasses (Mask Scoring) need as well as the loss."""
        # positives live in the first pos_cap slots of each image's
        # sample block (see sample_rois_for_training)
        pos_cap = int(tc["rcnn"]["num_samples"] * tc["rcnn"]["pos_fraction"])
        pos_rois = samples.rois[:, :pos_cap]                  # (B, Pc, 5)
        pos_w = samples.bbox_weights[:, :pos_cap]             # (B, Pc)
        pos_labels = samples.labels[:, :pos_cap]
        mfeats = multilevel_roi_align(
            feats[:4], pos_rois.reshape(-1, 5),
            strides=self.featmap_strides, out_size=self.mask_roi_size)
        mlogits = self.mask_head_m(mfeats)                    # (B*Pc, 2s, 2s, C)

        def single_targets(gmasks, rois_i, gts_i, gvalid_i):
            ious = bbox_overlaps(gts_i, rois_i[:, 1:5])
            ious = jnp.where(gvalid_i[:, None], ious, -1.0)
            gidx = ious.argmax(axis=0)
            return mask_targets_from_bitmaps(
                gmasks, rois_i, gidx, out_size=self.mask_roi_size * 2)

        tgts = jax.vmap(single_targets)(
            gt_masks.astype(jnp.float32), pos_rois, gt_boxes, gt_valid)
        tgts = tgts.reshape(-1, *tgts.shape[2:])
        labels = pos_labels.reshape(-1)
        w = pos_w.reshape(-1)
        loss = mask_head_loss(mlogits, tgts, labels, w)
        return {"loss_mask": loss, "mfeats": mfeats, "mlogits": mlogits,
                "targets": tgts, "labels": labels, "weights": w}

    def _extra_mask_losses(self, losses_out, mask_out):
        """Hook for subclasses (Mask Scoring R-CNN adds loss_mask_iou)."""

    # -------------------------------------------------------------- testing
    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        """Returns DetResult batch: boxes (B, K, 4), scores, labels, mask.

        scale_factors: (B, 4) resize factors; boxes are divided by them to
        land in original-image coordinates (mmdet `rescale=True`).
        """
        cfg = self.test_cfg or default_test_cfg()
        feats = self.extract_feat(images, train=False,
                                  pano_ratio_v=pano_ratio_v)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, _ = self._anchors(cls_scores)
        props = rpn_proposals(cls_scores, bbox_preds, level_anchors,
                              img_shapes, target_stds=self.rpn_target_stds,
                              **cfg["rpn"])
        B, P, _ = props.boxes.shape
        bidx = jnp.broadcast_to(jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], props.boxes], axis=-1)
        roi_feats = self._roi_extract(feats, rois.reshape(B * P, 5))
        cls, reg = self.bbox_head_m(roi_feats)
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, -1), rois, img_shapes,
            self.num_classes, target_stds=self.rcnn_target_stds,
            roi_mask=props.mask, scale_factors=scale_factors, **cfg["rcnn"])


    # ------------------------------------------------------- TTA sub-steps
    def extract_proposals(self, images, img_shapes):
        """RPN proposals only (aug_test stage 1 — `aug_test_rpn`)."""
        cfg = self.test_cfg or default_test_cfg()
        feats = self.extract_feat(images, train=False)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, _ = self._anchors(cls_scores)
        return rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                             target_stds=self.rpn_target_stds, **cfg["rpn"])

    def bbox_for_rois(self, images, boxes, img_shapes):
        """Class scores + decoded per-class boxes for given proposal boxes
        (B, P, 4) — the per-aug piece of `aug_test` (`merge_aug_bboxes`
        averages these across augmentations)."""
        feats = self.extract_feat(images, train=False)
        B, P, _ = boxes.shape
        bidx = jnp.broadcast_to(jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], boxes], axis=-1)
        roi_feats = multilevel_roi_align(feats[:4], rois.reshape(B * P, 5),
                                         strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(roi_feats)
        scores = jax.nn.softmax(cls.reshape(B, P, -1), axis=-1)
        from ..core.bbox import delta_decode
        dec = delta_decode(boxes.reshape(B * P, 4),
                           reg.reshape(B * P, -1),
                           means=(0., 0., 0., 0.), stds=self.rcnn_target_stds)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        dec = dec.reshape(B, P, -1)
        k = dec.shape[-1] // 4
        x1 = jnp.clip(dec[..., 0::4], 0, w)
        y1 = jnp.clip(dec[..., 1::4], 0, h)
        x2 = jnp.clip(dec[..., 2::4], 0, w)
        y2 = jnp.clip(dec[..., 3::4], 0, h)
        dec = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(B, P, 4 * k)
        return scores, dec

    def simple_test_masks(self, images, img_shapes, scale_factors=None):
        """bbox detections + per-detection mask probabilities
        (`mask_rcnn` simple_test with masks).  Returns (DetResult,
        mask_probs (B, K, 2s, 2s)); paste to image size with
        `mask_head.paste_masks` on the host."""
        assert self.with_mask
        dets = self.simple_test(images, img_shapes, scale_factors)
        feats = self.extract_feat(images, train=False)
        B, K, _ = dets.boxes.shape
        boxes_net = dets.boxes
        if scale_factors is not None:
            boxes_net = boxes_net * scale_factors[:, None, :]
        bidx = jnp.broadcast_to(jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], boxes_net], axis=-1)
        mfeats = multilevel_roi_align(feats[:4], rois.reshape(B * K, 5),
                                      strides=self.featmap_strides,
                                      out_size=self.mask_roi_size)
        mlogits = self.mask_head_m(mfeats)
        lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        sel = jnp.take_along_axis(mlogits, lab[:, None, None, None], axis=-1)[..., 0]
        probs = jax.nn.sigmoid(sel)
        s2 = self.mask_roi_size * 2
        return dets, probs.reshape(B, K, s2, s2)


# Registry aliases matching the reference's detector type names.
DETECTORS.register(TwoStageDetector, name="FasterRCNN")
# `PanoFasterRCNN` (`panofaster_rcnn.py:8`) only differs by threading
# pano_ratio_v into the backbone; the TPU backbone owns its uv generation,
# so the orchestration is identical.
DETECTORS.register(TwoStageDetector, name="PanoFasterRCNN")


@DETECTORS.register
class MaskRCNN(TwoStageDetector):
    """Faster R-CNN + FCN mask branch (`mask_rcnn.py`)."""
    with_mask: bool = True


@DETECTORS.register
class RPN(TwoStageDetector):
    """Proposal-only detector (`mmdet/models/detectors/rpn.py`): trains and
    tests just the region proposal network; `simple_test` returns proposals
    as class-agnostic detections."""

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.rpn_m(feats)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None, pano_ratio_v=None):
        tc = self.train_cfg or default_train_cfg()
        feats = self.extract_feat(images, train=True,
                                  pano_ratio_v=pano_ratio_v)
        cls_scores, bbox_preds = self.rpn_m(feats)
        _, anchors = self._anchors(cls_scores)
        rng = self.make_rng("sampler")
        return rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes, gt_valid,
                        rng, target_stds=self.rpn_target_stds, **tc["rpn"])

    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        cfg = self.test_cfg or default_test_cfg()
        feats = self.extract_feat(images, train=False,
                                  pano_ratio_v=pano_ratio_v)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, _ = self._anchors(cls_scores)
        props = rpn_proposals(cls_scores, bbox_preds, level_anchors,
                              img_shapes, target_stds=self.rpn_target_stds,
                              **cfg["rpn"])
        boxes = props.boxes
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        labels = jnp.where(props.mask, 0, -1)
        return DetResult(boxes, jnp.where(props.mask, props.scores, NEG_INF),
                         labels, props.mask)


@DETECTORS.register
class FastRCNN(TwoStageDetector):
    """RoI-head-only detector (`mmdet/models/detectors/fast_rcnn.py`):
    proposals come in with the data (precomputed) instead of from an RPN."""

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, proposals=None, proposal_valid=None,
                      gt_masks=None, pano_ratio_v=None):
        assert proposals is not None, "FastRCNN requires precomputed proposals"
        tc = self.train_cfg or default_train_cfg()
        feats = self.extract_feat(images, train=True,
                                  pano_ratio_v=pano_ratio_v)
        if proposal_valid is None:
            proposal_valid = jnp.ones(proposals.shape[:2], bool)
        rng = self.make_rng("sampler")
        samples = sample_rois_for_training(
            rng, jax.lax.stop_gradient(proposals), proposal_valid, gt_boxes,
            gt_labels, gt_valid, self.num_classes,
            target_stds=self.rcnn_target_stds, **tc["rcnn"])
        B, S, _ = samples.rois.shape
        roi_feats = multilevel_roi_align(feats[:4], samples.rois.reshape(B * S, 5),
                                         strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(roi_feats)
        return bbox_head_loss(cls, reg, samples, self.num_classes)

    def simple_test(self, images, img_shapes, proposals=None,
                    scale_factors=None, proposal_valid=None,
                    pano_ratio_v=None):
        assert proposals is not None
        cfg = self.test_cfg or default_test_cfg()
        feats = self.extract_feat(images, train=False,
                                  pano_ratio_v=pano_ratio_v)
        B, P, _ = proposals.shape
        if proposal_valid is None:
            proposal_valid = jnp.ones((B, P), bool)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, P))
        rois = jnp.concatenate([bidx[..., None], proposals], axis=-1)
        roi_feats = multilevel_roi_align(feats[:4], rois.reshape(B * P, 5),
                                         strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(roi_feats)
        return bbox_head_detections(
            cls.reshape(B, P, -1), reg.reshape(B, P, -1), rois, img_shapes,
            self.num_classes, target_stds=self.rcnn_target_stds,
            roi_mask=proposal_valid, scale_factors=scale_factors,
            **cfg["rcnn"])


@DETECTORS.register
class DoubleHeadRCNN(TwoStageDetector):
    """Double-Head R-CNN (`mmdet/models/detectors/double_head_rcnn` via
    configs/double_heads): conv branch for regression, fc branch for
    classification in the RoI head."""

    def _default_bbox_head(self):
        return {"type": "DoubleConvFCBBoxHead"}


@DETECTORS.register
class DynamicRCNN(TwoStageDetector):
    """Dynamic R-CNN (`mmdet/models/roi_heads/dynamic_roi_head.py`,
    configs/dynamic_rcnn): the RCNN positive-IoU threshold adapts to the
    proposal-quality distribution.  The reference keeps a cross-iteration
    running statistic; under jit we use the tight per-batch equivalent —
    threshold = mean of the top-k proposal IoUs of the batch, clamped to
    the static base threshold from below.
    """
    dynamic_topk: int = 75

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None, pano_ratio_v=None):
        tc = dict(self.train_cfg or default_train_cfg())
        feats = self.extract_feat(images, train=True,
                                  pano_ratio_v=pano_ratio_v)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, anchors = self._anchors(cls_scores)
        losses_out = rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes,
                              gt_valid, self.make_rng("sampler"),
                              target_stds=self.rpn_target_stds, **tc["rpn"])
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                          target_stds=self.rpn_target_stds,
                          **tc["rpn_proposal"]))

        # dynamic IoU threshold: mean of the batch top-k proposal-gt IoUs
        def top_ious(boxes, mask, gts, gvalid):
            ious = bbox_overlaps(boxes, gts)            # (P, G)
            ious = jnp.where(mask[:, None] & gvalid[None, :], ious, 0.0)
            best = ious.max(axis=1)
            k = min(self.dynamic_topk, best.shape[0])
            return jax.lax.top_k(best, k)[0]
        tk = jax.vmap(top_ious)(props.boxes, props.mask, gt_boxes, gt_valid)
        base = tc["rcnn"].get("pos_iou_thr", 0.5)
        dyn_thr = jnp.maximum(tk.mean(), base)

        rcnn_cfg = dict(tc["rcnn"])
        rcnn_cfg["pos_iou_thr"] = dyn_thr
        rcnn_cfg["neg_iou_thr"] = dyn_thr
        rcnn_cfg["min_pos_iou"] = dyn_thr
        samples = sample_rois_for_training(
            self.make_rng("sampler"), props.boxes, props.mask, gt_boxes,
            gt_labels, gt_valid, self.num_classes,
            target_stds=self.rcnn_target_stds, **rcnn_cfg)
        B, S, _ = samples.rois.shape
        roi_feats = multilevel_roi_align(
            feats[:4], samples.rois.reshape(B * S, 5),
            strides=self.featmap_strides)
        cls, reg = self.bbox_head_m(roi_feats)
        losses_out.update(bbox_head_loss(cls, reg, samples, self.num_classes))
        return losses_out


@DETECTORS.register
class MaskScoringRCNN(MaskRCNN):
    """Mask Scoring R-CNN (`mmdet/models/detectors/mask_scoring_rcnn.py`):
    Mask R-CNN + a MaskIoUHead whose predicted mask IoU multiplies the
    classification score at test time."""

    def setup(self):
        super().setup()
        self.mask_iou_head_m = MaskIoUHead(num_classes=self.num_classes)

    def _init_extra_mask(self, mfeats, mlogits):
        probs = jax.nn.sigmoid(mlogits[..., 0])
        self.mask_iou_head_m(mfeats, probs)

    def _extra_mask_losses(self, losses_out, mask_out):
        # background label == num_classes on padded slots: clip before the
        # gather (out-of-bounds take_along_axis NaN-fills under jit)
        labels = jnp.clip(mask_out["labels"], 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            mask_out["mlogits"], labels[:, None, None, None], axis=-1)[..., 0]
        probs = jax.nn.sigmoid(sel)
        iou_pred = self.mask_iou_head_m(mask_out["mfeats"], probs)
        iou_tgt = jax.lax.stop_gradient(
            mask_iou_targets(probs, mask_out["targets"]))
        losses_out["loss_mask_iou"] = mask_iou_loss(
            iou_pred, iou_tgt, labels, mask_out["weights"])

    def simple_test_masks(self, images, img_shapes, scale_factors=None):
        dets, probs = super().simple_test_masks(images, img_shapes,
                                                scale_factors)
        feats = self.extract_feat(images, train=False)
        B, K, _ = dets.boxes.shape
        boxes_net = dets.boxes
        if scale_factors is not None:
            boxes_net = boxes_net * scale_factors[:, None, :]
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], boxes_net], axis=-1)
        mfeats = multilevel_roi_align(feats[:4], rois.reshape(B * K, 5),
                                      strides=self.featmap_strides,
                                      out_size=self.mask_roi_size)
        iou_pred = self.mask_iou_head_m(mfeats, probs.reshape(B * K,
                                                              *probs.shape[2:]))
        lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        miou = jnp.take_along_axis(iou_pred, lab[:, None], axis=1)[:, 0]
        miou = jnp.clip(miou.reshape(B, K), 0.0, 1.0)
        from ..ops.nms import DetResult as _DR
        new_scores = jnp.where(dets.mask, dets.scores * miou, dets.scores)
        return _DR(dets.boxes, new_scores, dets.labels, dets.mask), probs


# `mmdet/models/detectors/trident_faster_rcnn.py`: Faster R-CNN over the
# weight-shared multi-dilation TridentResNet backbone.  The reference's
# branch-as-batch trick is a CUDA-memory workaround; here the trident
# branches are vmapped inside the backbone (`backbones_extra.TridentResNet`)
# and the detection orchestration is the standard two-stage path.
DETECTORS.register(TwoStageDetector, name="TridentFasterRCNN")


@DETECTORS.register
class DetectoRS(TwoStageDetector):
    """DetectoRS (`mmdet/models/detectors/` via `necks/rfp.py` +
    `backbones/detectors_resnet.py`): Recursive Feature Pyramid — the FPN
    output is fed back into the backbone stages (zero-init 1x1 rfp convs)
    for `rfp_steps` unrolled passes; passes are fused with a learned
    per-pixel sigmoid gate (zero-init -> starts at an even blend).
    SAC (`ops.deform_conv.SAC`) is available as the backbone conv variant;
    the ASPP inside the reference's RFP module is a capacity detail not
    reproduced here.
    """
    rfp_steps: int = 2

    def setup(self):
        super().setup()
        self.rfp_weight = nn.Conv(1, (1, 1),
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name="rfp_weight")

    def extract_feat(self, images, train=False, pano_ratio_v=None):
        feats = self.backbone_m(images, train=train)
        p = self.neck_m(feats)
        n_stage = len(feats)
        for _ in range(self.rfp_steps - 1):
            feats2 = self.backbone_m(images, train=train,
                                     rfp_feats=p[:n_stage])
            p2 = self.neck_m(feats2)
            fused = []
            for a, b in zip(p, p2):
                w = jax.nn.sigmoid(self.rfp_weight(b))
                fused.append(w * b + (1 - w) * a)
            p = tuple(fused)
        return p
