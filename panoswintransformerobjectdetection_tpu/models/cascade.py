"""Cascade (Mask) R-CNN: multi-stage RoI refinement.

Covers the reference's `CascadeRCNN` detector + `CascadeRoIHead`
(`cascade_roi_head.py`) as used by `configs/swin/cascade_mask_rcnn_swin_*`:
three bbox stages with rising IoU thresholds (0.5/0.6/0.7), class-agnostic
regression, per-stage target stds and loss weights (1, 0.5, 0.25); at test
time boxes refine stage-to-stage and class scores average across stages.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.bbox import delta_decode
from .registry import DETECTORS
from .detectors import TwoStageDetector, default_train_cfg, default_test_cfg
from .roi_head import (
    Shared2FCBBoxHead, multilevel_roi_align, sample_rois_for_training,
    bbox_head_loss, bbox_head_detections,
)
from .rpn_head import rpn_loss, rpn_proposals
from .mask_head import FCNMaskHead

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


@DETECTORS.register
class CascadeRCNN(TwoStageDetector):
    num_stages: int = 3
    cascade_return_feat: bool = False   # SCNet: expose the shared fc feature

    def setup(self):
        super().setup()
        if self.bbox_head:
            # per-stage head from config (e.g. Shared4Conv1FCBBoxHead for
            # the swin giou_4conv1f recipes)
            from .registry import HEADS, build as _build
            heads = []
            for t in range(self.num_stages):
                hc = dict(self.bbox_head)
                hc.setdefault("num_classes", self.num_classes)
                hc.setdefault("reg_class_agnostic", True)
                hc.setdefault("dtype", self.compute_dtype)
                hc["name"] = f"cascade_head_{t}"
                heads.append(_build(HEADS, hc))
            self.cascade_heads = heads
        else:
            self.cascade_heads = [
                Shared2FCBBoxHead(num_classes=self.num_classes,
                                  reg_class_agnostic=True,
                                  return_feat=self.cascade_return_feat,
                                  dtype=self.compute_dtype,
                                  name=f"cascade_head_{t}")
                for t in range(self.num_stages)
            ]

    def __call__(self, images, train: bool = False):
        out = super().__call__(images, train=train)
        feats = out[0]
        B = images.shape[0]
        dummy_rois = jnp.zeros((B, 5), images.dtype)
        dummy_rois = dummy_rois.at[:, 3:].set(32.0)
        rf = multilevel_roi_align(feats[:4], dummy_rois,
                                  strides=self.featmap_strides)
        for h in self.cascade_heads:
            h(rf)
        return out

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None) -> Dict[str, jnp.ndarray]:
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

        boxes, mask = props.boxes, props.mask
        B = boxes.shape[0]
        rcnn_cfg = dict(tc["rcnn"])
        reg_loss = rcnn_cfg.pop("reg_loss", "l1")
        reg_loss_weight = rcnn_cfg.pop("reg_loss_weight", 1.0)
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
                                   reg_class_agnostic=True,
                                   reg_loss=reg_loss,
                                   reg_loss_weight=reg_loss_weight,
                                   target_stds=STAGE_STDS[t])
            for k, v in stage.items():
                losses_out[f"s{t}.{k}"] = v * (STAGE_WEIGHTS[t] if "loss" in k else 1.0)

            # refine: decoded boxes of this stage feed the next stage
            if t < self.num_stages - 1:
                dec = delta_decode(
                    samples.rois[..., 1:5].reshape(B * S, 4),
                    reg.reshape(B * S, 4),
                    means=(0., 0., 0., 0.), stds=STAGE_STDS[t])
                boxes = jax.lax.stop_gradient(dec.reshape(B, S, 4))
                mask = samples.label_weights > 0
        return losses_out

    def simple_test(self, images, img_shapes, scale_factors=None):
        cfg = self.test_cfg or default_test_cfg()
        feats = self.extract_feat(images, train=False)
        cls_scores, bbox_preds = self.rpn_m(feats)
        level_anchors, _ = self._anchors(cls_scores)
        props = rpn_proposals(cls_scores, bbox_preds, level_anchors, img_shapes,
                              target_stds=self.rpn_target_stds, **cfg["rpn"])
        B, P, _ = props.boxes.shape
        boxes = props.boxes
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None, None], (B, P, 1))

        stage_scores = []
        for t in range(self.num_stages):
            rois = jnp.concatenate([bidx, boxes], axis=-1)
            rf = multilevel_roi_align(feats[:4], rois.reshape(B * P, 5),
                                      strides=self.featmap_strides)
            cls, reg = self.cascade_heads[t](rf)[:2]
            stage_scores.append(jax.nn.softmax(cls.reshape(B, P, -1), axis=-1))
            dec = delta_decode(boxes.reshape(B * P, 4), reg.reshape(B * P, 4),
                               means=(0., 0., 0., 0.), stds=STAGE_STDS[t])
            h = jnp.repeat(img_shapes[:, 0], P)
            w = jnp.repeat(img_shapes[:, 1], P)
            x = jnp.clip(dec[:, 0::2], 0, w[:, None])
            y = jnp.clip(dec[:, 1::2], 0, h[:, None])
            dec = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], -1)
            boxes = dec.reshape(B, P, 4)

        avg_scores = sum(stage_scores) / self.num_stages
        rois = jnp.concatenate([bidx, boxes], axis=-1)
        # final boxes come from the last stage; single decode already applied,
        # pass zero deltas through the shared detection path
        zero_reg = jnp.zeros((B, P, 4), jnp.float32)
        return bbox_head_detections(
            jnp.log(jnp.clip(avg_scores, 1e-9)), zero_reg, rois, img_shapes,
            self.num_classes, target_stds=(1.0, 1.0, 1.0, 1.0),
            roi_mask=props.mask, scale_factors=scale_factors, **cfg["rcnn"])


@DETECTORS.register
class CascadeMaskRCNN(CascadeRCNN):
    with_mask: bool = True
