"""Hybrid Task Cascade (`mmdet/models/detectors/htc.py` +
`roi_heads/htc_roi_head.py`).

Cascade R-CNN plus: a mask head per stage with mask-information flow
(stage i's mask features receive a 1x1-conv of stage i-1's), and an
optional semantic-segmentation branch whose RoI-aligned features are added
into both bbox and mask RoI features.  Test-time masks average the stage
probabilities.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.bbox import bbox_overlaps, delta_decode
from .registry import DETECTORS
from .cascade import CascadeRCNN, STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS
from .detectors import default_train_cfg, default_test_cfg
from .roi_head import multilevel_roi_align, sample_rois_for_training, \
    bbox_head_loss
from .rpn_head import rpn_loss, rpn_proposals
from .mask_head import FCNMaskHead, mask_targets_from_bitmaps, mask_head_loss


class SemanticBranch(nn.Module):
    """Fused-FPN semantic head (`htc_roi_head.py` FusedSemanticHead role):
    upsample all levels to the finest, sum, 4 convs -> (sem map, logits)."""
    out_channels: int = 128
    num_convs: int = 4
    num_classes: int = 183

    @nn.compact
    def __call__(self, feats):
        from .fpn import nearest_upsample
        h, w = feats[0].shape[1:3]
        x = sum(nearest_upsample(f, h, w) for f in feats[1:]) + feats[0]
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        logits = nn.Conv(self.num_classes, (1, 1), name="sem_logits")(x)
        return x, logits


@DETECTORS.register
class HybridTaskCascade(CascadeRCNN):
    with_mask: bool = True
    with_semantic: bool = False
    semantic_classes: int = 183

    def setup(self):
        super().setup()
        self.mask_heads = [
            FCNMaskHead(num_classes=self.num_classes, name=f"mask_head_{t}")
            for t in range(self.num_stages)
        ]
        roi_ch = (self.neck or {}).get("out_channels", 256)
        self.mask_info_convs = [
            nn.Conv(roi_ch, (1, 1), name=f"mask_info_{t}")
            for t in range(1, self.num_stages)
        ]
        if self.with_semantic:
            self.semantic_m = SemanticBranch(num_classes=self.semantic_classes,
                                             name="semantic")
            self.semantic_roi_proj = nn.Conv(roi_ch, (1, 1),
                                             name="semantic_proj")

    def _mask_roi_feats(self, feats, rois, sem_feat=None):
        mf = multilevel_roi_align(feats[:4], rois,
                                  strides=self.featmap_strides,
                                  out_size=self.mask_roi_size)
        if sem_feat is not None:
            sf = multilevel_roi_align((sem_feat,) * 4, rois,
                                      strides=self.featmap_strides,
                                      out_size=self.mask_roi_size)
            mf = mf + self.semantic_roi_proj(sf)
        return mf

    def __call__(self, images, train: bool = False):
        out = super().__call__(images, train=train)
        feats = out[0]
        B = images.shape[0]
        rois = jnp.zeros((B, 5), images.dtype).at[:, 3:].set(32.0)
        sem_feat = None
        if self.with_semantic:
            sem_feat, _ = self.semantic_m(feats[:4])
        prev = None
        for t in range(self.num_stages):
            mf = self._mask_roi_feats(feats, rois, sem_feat)
            if prev is not None:
                mf = mf + self.mask_info_convs[t - 1](prev)
            self.mask_heads[t](mf)
            prev = mf
        return out

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None,
                      gt_semantic=None) -> Dict[str, jnp.ndarray]:
        tc = self.train_cfg or default_train_cfg()
        feats = self.extract_feat(images, train=True)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, anchors = self._anchors(cls_scores)
        rng = self.make_rng("sampler")
        rngs = jax.random.split(rng, self.num_stages + 1)

        losses_out = rpn_loss(cls_scores, bbox_preds, anchors, gt_boxes,
                              gt_valid, rngs[0],
                              target_stds=self.rpn_target_stds, **tc["rpn"])
        props = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                          target_stds=self.rpn_target_stds,
                          **tc["rpn_proposal"]))

        sem_feat = None
        if self.with_semantic:
            sem_feat, sem_logits = self.semantic_m(feats[:4])
            if gt_semantic is not None:
                from ..core import losses as L
                sh, sw = sem_logits.shape[1:3]
                tgt = jax.image.resize(
                    gt_semantic.astype(jnp.int32)[..., None].astype(jnp.float32),
                    (gt_semantic.shape[0], sh, sw, 1), "nearest")[..., 0]
                losses_out["loss_semantic"] = 0.2 * L.cross_entropy(
                    sem_logits, tgt.astype(jnp.int32))

        boxes, mask = props.boxes, props.mask
        B = boxes.shape[0]
        rcnn_cfg = dict(tc["rcnn"])
        prev_mf = None
        for t in range(self.num_stages):
            rcnn_cfg.update(pos_iou_thr=STAGE_IOUS[t], neg_iou_thr=STAGE_IOUS[t],
                            min_pos_iou=STAGE_IOUS[t])
            samples = sample_rois_for_training(
                rngs[t + 1], boxes, mask, gt_boxes, gt_labels, gt_valid,
                self.num_classes, target_stds=STAGE_STDS[t], **rcnn_cfg)
            S = samples.rois.shape[1]
            rf = multilevel_roi_align(feats[:4], samples.rois.reshape(B * S, 5),
                                      strides=self.featmap_strides)
            cls, reg = self.cascade_heads[t](rf)[:2]
            stage = bbox_head_loss(cls, reg, samples, self.num_classes,
                                   reg_class_agnostic=True)
            for k, v in stage.items():
                losses_out[f"s{t}.{k}"] = v * (STAGE_WEIGHTS[t] if "loss" in k else 1.0)

            if gt_masks is not None:
                pos_cap = int(rcnn_cfg["num_samples"] * rcnn_cfg["pos_fraction"])
                pos_rois = samples.rois[:, :pos_cap]
                pos_w = samples.bbox_weights[:, :pos_cap]
                pos_labels = samples.labels[:, :pos_cap]
                mf = self._mask_roi_feats(feats, pos_rois.reshape(-1, 5),
                                          sem_feat)
                if prev_mf is not None:
                    mf = mf + self.mask_info_convs[t - 1](prev_mf)
                mlogits = self.mask_heads[t](mf)
                prev_mf = mf

                def single_targets(gmasks, rois_i, gts_i, gvalid_i):
                    ious = bbox_overlaps(gts_i, rois_i[:, 1:5])
                    ious = jnp.where(gvalid_i[:, None], ious, -1.0)
                    gidx = ious.argmax(axis=0)
                    return mask_targets_from_bitmaps(
                        gmasks, rois_i, gidx, out_size=self.mask_roi_size * 2)

                tgts = jax.vmap(single_targets)(
                    gt_masks.astype(jnp.float32), pos_rois, gt_boxes, gt_valid)
                losses_out[f"s{t}.loss_mask"] = STAGE_WEIGHTS[t] * mask_head_loss(
                    mlogits, tgts.reshape(-1, *tgts.shape[2:]),
                    pos_labels.reshape(-1), pos_w.reshape(-1))

            if t < self.num_stages - 1:
                dec = delta_decode(
                    samples.rois[..., 1:5].reshape(B * S, 4),
                    reg.reshape(B * S, 4),
                    means=(0., 0., 0., 0.), stds=STAGE_STDS[t])
                boxes = jax.lax.stop_gradient(dec.reshape(B, S, 4))
                mask = samples.label_weights > 0
        return losses_out

    def simple_test_masks(self, images, img_shapes, scale_factors=None):
        dets = self.simple_test(images, img_shapes, scale_factors)
        feats = self.extract_feat(images, train=False)
        sem_feat = None
        if self.with_semantic:
            sem_feat, _ = self.semantic_m(feats[:4])
        B, K, _ = dets.boxes.shape
        boxes_net = dets.boxes
        if scale_factors is not None:
            boxes_net = boxes_net * scale_factors[:, None, :]
        bidx = jnp.broadcast_to(jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], boxes_net], -1).reshape(B * K, 5)
        prev = None
        probs = 0.0
        lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        for t in range(self.num_stages):
            mf = self._mask_roi_feats(feats, rois, sem_feat)
            if prev is not None:
                mf = mf + self.mask_info_convs[t - 1](prev)
            ml = self.mask_heads[t](mf)
            prev = mf
            sel = jnp.take_along_axis(ml, lab[:, None, None, None], -1)[..., 0]
            probs = probs + jax.nn.sigmoid(sel)
        probs = probs / self.num_stages
        s2 = self.mask_roi_size * 2
        return dets, probs.reshape(B, K, s2, s2)
