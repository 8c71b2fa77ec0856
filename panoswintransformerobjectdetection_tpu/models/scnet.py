"""SCNet (`mmdet/models/detectors/scnet.py` + `roi_heads/scnet_roi_head.py`):
sample-consistent cascade — Cascade R-CNN bbox stages plus ONE shared mask
branch that consumes (a) a feature-relay map built from the last bbox
stage's shared-fc feature of the same RoIs (`feature_relay_head.py`),
(b) a global-context vector pooled from the FPN and supervised with
multi-label BCE over the image's classes (`global_context_head.py`), and
(c) optionally the HTC fused semantic map.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses as L
from ..core.bbox import bbox_overlaps, delta_decode
from .registry import DETECTORS, HEADS
from .cascade import CascadeRCNN, STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS
from .detectors import default_train_cfg
from .htc import SemanticBranch
from .roi_head import (Shared2FCBBoxHead, multilevel_roi_align,
                       sample_rois_for_training, bbox_head_loss)
from .rpn_head import rpn_loss, rpn_proposals
from .mask_head import (FCNMaskHead, mask_targets_from_bitmaps,
                        mask_head_loss)


@HEADS.register
class GlobalContextHead(nn.Module):
    """`global_context_head.py`: pooled P2..P5 -> fc -> (context vector,
    multi-label class logits)."""
    num_classes: int = 80
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        pooled = sum(jnp.mean(f, axis=(1, 2)) for f in feats[:4])
        x = nn.relu(nn.Dense(self.feat_channels, name="fc")(pooled))
        logits = nn.Dense(self.num_classes, name="fc_cls")(x)
        return x, logits


@HEADS.register
class FeatureRelayHead(nn.Module):
    """`feature_relay_head.py`: shared fc feature (R, F) -> fc -> spatial
    (R, s, s, C) map added to mask RoI features."""
    out_channels: int = 256
    roi_size: int = 14

    @nn.compact
    def __call__(self, fc_feat):
        s = self.roi_size
        x = nn.Dense(s * s * self.out_channels, name="fc")(fc_feat)
        return x.reshape(-1, s, s, self.out_channels)


@DETECTORS.register
class SCNet(CascadeRCNN):
    with_mask: bool = True
    with_semantic: bool = False
    semantic_classes: int = 183

    cascade_return_feat: bool = True    # expose shared fc for the relay

    def setup(self):
        super().setup()
        roi_ch = (self.neck or {}).get("out_channels", 256)
        self.gc_head_m = GlobalContextHead(num_classes=self.num_classes,
                                           feat_channels=roi_ch,
                                           name="gc_head")
        self.relay_m = FeatureRelayHead(out_channels=roi_ch,
                                        roi_size=self.mask_roi_size,
                                        name="feat_relay")
        if self.with_semantic:
            self.semantic_m = SemanticBranch(
                num_classes=self.semantic_classes, name="semantic")
            self.semantic_roi_proj = nn.Conv(roi_ch, (1, 1),
                                             name="semantic_proj")

    def _mask_feats(self, feats, rois, gc_vec, relay, sem_feat=None):
        mf = multilevel_roi_align(feats[:4], rois,
                                  strides=self.featmap_strides,
                                  out_size=self.mask_roi_size)
        if sem_feat is not None:
            sf = multilevel_roi_align((sem_feat,) * 4, rois,
                                      strides=self.featmap_strides,
                                      out_size=self.mask_roi_size)
            mf = mf + self.semantic_roi_proj(sf)
        bidx = jnp.clip(rois[:, 0].astype(jnp.int32), 0,
                        gc_vec.shape[0] - 1)
        mf = mf + gc_vec[bidx][:, None, None, :]
        return mf + relay

    def _relay_of(self, feats, rois):
        """Last-stage shared-fc feature of `rois` -> relayed spatial map."""
        rf = multilevel_roi_align(feats[:4], rois,
                                  strides=self.featmap_strides)
        _, _, fc = self.cascade_heads[-1](rf)
        return self.relay_m(fc)

    def __call__(self, images, train: bool = False):
        out = super().__call__(images, train=train)
        feats = out[0]
        B = images.shape[0]
        rois = jnp.zeros((B, 5), images.dtype).at[:, 3:].set(32.0)
        gc_vec, _ = self.gc_head_m(feats)
        sem = None
        if self.with_semantic:
            sem, _ = self.semantic_m(feats[:4])
        relay = self._relay_of(feats, rois)
        self.mask_head_m(self._mask_feats(feats, rois, gc_vec, relay, sem))
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

        gc_vec, gc_logits = self.gc_head_m(feats)
        onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, self.num_classes - 1),
                                self.num_classes)
        gc_tgt = jnp.clip((onehot * gt_valid[..., None]).sum(1), 0, 1)
        losses_out["loss_glbctx"] = 3.0 * L.binary_cross_entropy(
            gc_logits, jax.lax.stop_gradient(gc_tgt))

        sem_feat = None
        if self.with_semantic:
            sem_feat, sem_logits = self.semantic_m(feats[:4])
            if gt_semantic is not None:
                sh, sw = sem_logits.shape[1:3]
                tgt = jax.image.resize(
                    gt_semantic.astype(jnp.float32)[..., None],
                    (gt_semantic.shape[0], sh, sw, 1), "nearest")[..., 0]
                losses_out["loss_semantic"] = 0.2 * L.cross_entropy(
                    sem_logits, tgt.astype(jnp.int32))

        boxes, mask = props.boxes, props.mask
        B = boxes.shape[0]
        rcnn_cfg = dict(tc["rcnn"])
        samples = None
        for t in range(self.num_stages):
            rcnn_cfg.update(pos_iou_thr=STAGE_IOUS[t],
                            neg_iou_thr=STAGE_IOUS[t],
                            min_pos_iou=STAGE_IOUS[t])
            samples = sample_rois_for_training(
                rngs[t + 1], boxes, mask, gt_boxes, gt_labels, gt_valid,
                self.num_classes, target_stds=STAGE_STDS[t], **rcnn_cfg)
            S = samples.rois.shape[1]
            rf = multilevel_roi_align(feats[:4],
                                      samples.rois.reshape(B * S, 5),
                                      strides=self.featmap_strides)
            cls, reg = self.cascade_heads[t](rf)[:2]
            stage = bbox_head_loss(cls, reg, samples, self.num_classes,
                                   reg_class_agnostic=True)
            for k, v in stage.items():
                losses_out[f"s{t}.{k}"] = v * (STAGE_WEIGHTS[t]
                                               if "loss" in k else 1.0)
            if t < self.num_stages - 1:
                dec = delta_decode(samples.rois[..., 1:5].reshape(B * S, 4),
                                   reg.reshape(B * S, 4),
                                   means=(0., 0., 0., 0.),
                                   stds=STAGE_STDS[t])
                boxes = jax.lax.stop_gradient(dec.reshape(B, S, 4))
                mask = samples.label_weights > 0

        if gt_masks is not None:
            pos_cap = int(rcnn_cfg["num_samples"] * rcnn_cfg["pos_fraction"])
            pos_rois = samples.rois[:, :pos_cap]
            pos_w = samples.bbox_weights[:, :pos_cap]
            pos_labels = samples.labels[:, :pos_cap]
            flat = pos_rois.reshape(-1, 5)
            relay = self._relay_of(feats, flat)
            mf = self._mask_feats(feats, flat, gc_vec, relay, sem_feat)
            mlogits = self.mask_head_m(mf)

            def single_targets(gmasks, rois_i, gts_i, gvalid_i):
                ious = bbox_overlaps(gts_i, rois_i[:, 1:5])
                ious = jnp.where(gvalid_i[:, None], ious, -1.0)
                gidx = ious.argmax(axis=0)
                return mask_targets_from_bitmaps(
                    gmasks, rois_i, gidx, out_size=self.mask_roi_size * 2)

            tgts = jax.vmap(single_targets)(
                gt_masks.astype(jnp.float32), pos_rois, gt_boxes, gt_valid)
            losses_out["loss_mask"] = mask_head_loss(
                mlogits, tgts.reshape(-1, *tgts.shape[2:]),
                pos_labels.reshape(-1), pos_w.reshape(-1))
        return losses_out

    def simple_test_masks(self, images, img_shapes, scale_factors=None):
        dets = self.simple_test(images, img_shapes, scale_factors)
        feats = self.extract_feat(images, train=False)
        gc_vec, _ = self.gc_head_m(feats)
        sem = None
        if self.with_semantic:
            sem, _ = self.semantic_m(feats[:4])
        B, K, _ = dets.boxes.shape
        boxes_net = dets.boxes
        if scale_factors is not None:
            boxes_net = boxes_net * scale_factors[:, None, :]
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], boxes_net],
                               -1).reshape(B * K, 5)
        relay = self._relay_of(feats, rois)
        ml = self.mask_head_m(self._mask_feats(feats, rois, gc_vec, relay,
                                               sem))
        lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        sel = jnp.take_along_axis(ml, lab[:, None, None, None], -1)[..., 0]
        s2 = self.mask_roi_size * 2
        return dets, jax.nn.sigmoid(sel).reshape(B, K, s2, s2)
