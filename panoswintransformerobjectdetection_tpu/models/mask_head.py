"""FCN mask head + mask target/loss/decode (Mask R-CNN branch).

Covers the reference's `FCNMaskHead` (`mask_heads/fcn_mask_head.py`) and the
mask-target path of `StandardRoIHead.forward_train`: 4x conv3x3 -> deconv2x
-> 1x1 per-class logits on 14x14 RoI features; targets are gt masks
cropped+resized to 28x28 (here via RoIAlign on the bitmap — fixed-shape).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.roi_align import roi_align
from .registry import HEADS


@HEADS.register
class FCNMaskHead(nn.Module):
    num_classes: int = 80
    num_convs: int = 4
    conv_out_channels: int = 256

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """roi_feats: (R, s, s, C) -> mask logits (R, 2s, 2s, num_classes)."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)


def mask_targets_from_bitmaps(gt_masks: jnp.ndarray, rois: jnp.ndarray,
                              gt_idx: jnp.ndarray, out_size: int = 28) -> jnp.ndarray:
    """Crop+resize gt bitmap masks to RoI-aligned targets.

    gt_masks: (G, H, W) float {0,1} per image; rois: (S, 5); gt_idx: (S,)
    which gt each sampled roi matches.  Returns (S, out, out) in [0, 1].
    """
    G, H, W = gt_masks.shape
    sel = gt_masks[gt_idx][..., None]                 # (S, H, W, 1)
    r = rois.at[:, 0].set(jnp.arange(rois.shape[0], dtype=rois.dtype))
    out = roi_align(sel, r, out_size=out_size, spatial_scale=1.0,
                    sampling_ratio=2, aligned=True)
    return jnp.clip(out[..., 0], 0.0, 1.0)


def mask_head_loss(mask_logits: jnp.ndarray, mask_targets: jnp.ndarray,
                   labels: jnp.ndarray, pos_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel BCE on the channel of the matched class, positives only
    (`fcn_mask_head.py loss` semantics)."""
    S = mask_logits.shape[0]
    lab = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
    logits = jnp.take_along_axis(
        mask_logits, lab[:, None, None, None], axis=-1)[..., 0]
    t = (mask_targets >= 0.5).astype(logits.dtype)
    bce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_roi = bce.mean(axis=(1, 2))
    denom = jnp.maximum(pos_mask.sum(), 1.0)
    return (per_roi * pos_mask).sum() / denom


def paste_masks(mask_probs: jnp.ndarray, boxes: jnp.ndarray,
                img_h: int, img_w: int, thr: float = 0.5) -> jnp.ndarray:
    """Paste (K, m, m) RoI masks into (K, img_h, img_w) bool maps — the
    inference-side of `FCNMaskHead.get_seg_masks`, as a batched inverse
    bilinear resample."""
    K, m, _ = mask_probs.shape
    ys = jnp.arange(img_h, dtype=jnp.float32)[None, :, None]   # (1, H, 1)
    xs = jnp.arange(img_w, dtype=jnp.float32)[None, None, :]   # (1, 1, W)
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    w = jnp.maximum(boxes[:, 2][:, None, None] - x1, 1e-3)
    h = jnp.maximum(boxes[:, 3][:, None, None] - y1, 1e-3)
    gx = (xs + 0.5 - x1) / w * m - 0.5
    gy = (ys + 0.5 - y1) / h * m - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def g(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, m - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, m - 1)
        # (K, H, W) gather from (K, m, m)
        flat = mask_probs.reshape(K, m * m)
        idx = yi * m + xi
        idx = jnp.broadcast_to(idx, (K, img_h, img_w)).reshape(K, -1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(K, img_h, img_w)

    val = (g(y0, x0) * (1 - wx) * (1 - wy) + g(y0, x0 + 1) * wx * (1 - wy) +
           g(y0 + 1, x0) * (1 - wx) * wy + g(y0 + 1, x0 + 1) * wx * wy)
    inside = (gx > -1) & (gx < m) & (gy > -1) & (gy < m)
    return (jnp.where(inside, val, 0.0) >= thr)


class MaskIoUHead(nn.Module):
    """Mask IoU regressor (`mmdet/models/roi_heads/mask_heads/maskiou_head.py`,
    Mask Scoring R-CNN): mask RoI features concatenated with the max-pooled
    predicted mask go through convs (last stride-2) + FCs to a per-class
    predicted mask IoU in [0, inf) (trained toward the true IoU)."""
    num_classes: int = 80
    num_convs: int = 4
    conv_out_channels: int = 256
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray,
                 mask_pred: jnp.ndarray) -> jnp.ndarray:
        """roi_feats (R, s, s, C); mask_pred (R, 2s, 2s) probabilities for
        the selected class.  Returns (R, num_classes) predicted mask IoU."""
        pooled = nn.max_pool(mask_pred[..., None], (2, 2), strides=(2, 2))
        x = jnp.concatenate([roi_feats, pooled], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride), padding=1,
                                name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc_mask_iou")(x)


def mask_iou_targets(mask_probs: jnp.ndarray, mask_targets: jnp.ndarray,
                     thr: float = 0.5) -> jnp.ndarray:
    """True IoU between the binarized predicted mask and the RoI-cropped gt
    target (`maskiou_head.py get_targets`, computed within the RoI)."""
    p = (mask_probs > thr).astype(jnp.float32)
    t = (mask_targets > thr).astype(jnp.float32)
    inter = (p * t).sum((-2, -1))
    union = jnp.maximum(p.sum((-2, -1)) + t.sum((-2, -1)) - inter, 1e-6)
    return inter / union


def mask_iou_loss(iou_pred: jnp.ndarray, iou_target: jnp.ndarray,
                  labels: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """L2 on the gt-class channel over positive samples (reference uses MSE
    with 0.5 weight)."""
    # clip: padded/negative slots carry the background label == num_classes
    # (out of bounds -> NaN fill under jit); their weight is 0 but 0*NaN=NaN
    lab = jnp.clip(labels, 0, iou_pred.shape[1] - 1)
    sel = jnp.take_along_axis(iou_pred, lab[:, None], axis=1)[:, 0]
    per = 0.5 * (sel - iou_target) ** 2
    return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)
