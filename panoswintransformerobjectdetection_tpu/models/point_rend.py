"""PointRend (`mmdet/models/roi_heads/point_rend_roi_head.py` +
`mask_heads/mask_point_head.py`, `detectors/point_rend.py`): Mask R-CNN
whose coarse mask is refined at adaptively-chosen uncertain points by a
shared MLP over (fine-grained P2 features, coarse mask logits).

Fixed-shape: training points use the reference's importance sampling
(oversample x3, keep the most-uncertain beta fraction, fill the rest with
uniform points) with static counts; test-time subdivision runs a static
number of steps, re-evaluating the `subdivision_num_points` most uncertain
pixels each step and scattering the refreshed logits back.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resample_alias import point_sample
from .detectors import MaskRCNN, DETECTORS
from .registry import HEADS


def uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """-|logit| of the selected class: closest to the 0.5 boundary wins."""
    return -jnp.abs(logits)


@HEADS.register
class MaskPointHead(nn.Module):
    """3 FC layers on concat(fine features, coarse logits), coarse logits
    re-appended at every layer (`mask_point_head.py`)."""
    num_classes: int = 80
    fc_channels: int = 256
    num_fcs: int = 3

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        """fine (R, P, Cf); coarse (R, P, C) -> point logits (R, P, C)."""
        x = jnp.concatenate([fine, coarse], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
            x = jnp.concatenate([x, coarse], -1)
        return nn.Dense(self.num_classes, name="fc_logits")(x)


def roi_points_to_image(rois: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """rois (R, 5); pts (R, P, 2) in [0,1] roi frame -> image xy."""
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    x = x1[:, None] + pts[..., 0] * (x2 - x1)[:, None]
    y = y1[:, None] + pts[..., 1] * (y2 - y1)[:, None]
    return jnp.stack([x, y], -1)


def sample_fine_features(feats: jnp.ndarray, stride: float,
                         rois: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample the fine P2 map of each roi's image at roi-frame points.
    feats (B, H, W, C); rois (R, 5); pts (R, P, 2) -> (R, P, C)."""
    B, H, W, _ = feats.shape
    img_xy = roi_points_to_image(rois, pts)
    norm = jnp.stack([img_xy[..., 0] / (stride * W),
                      img_xy[..., 1] / (stride * H)], -1)
    bidx = rois[:, 0].astype(jnp.int32)
    per_roi_feats = feats[jnp.clip(bidx, 0, B - 1)]       # (R, H, W, C)
    return point_sample(per_roi_feats, norm)


@DETECTORS.register
class PointRend(MaskRCNN):
    """Mask R-CNN + point refinement; the coarse FCN head is inherited."""
    num_points: int = 196
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    fine_stride: int = 4

    def setup(self):
        super().setup()
        self.point_head_m = MaskPointHead(num_classes=self.num_classes)

    def _init_extra_mask(self, mfeats, mlogits):
        R = mlogits.shape[0]
        pts = jnp.full((R, 4, 2), 0.5)
        fine = jnp.zeros((R, 4, mfeats.shape[-1]))
        coarse = jnp.zeros((R, 4, self.num_classes))
        self.point_head_m(fine, coarse)

    def _sample_train_points(self, rng, sel_logits):
        """(R, 2s, 2s) class-selected coarse logits -> (R, P, 2) points via
        oversampled uncertainty + uniform fill (`get_roi_rel_points_train`)."""
        R = sel_logits.shape[0]
        P = self.num_points
        n_over = P * self.oversample_ratio
        k_unc = int(P * self.importance_sample_ratio)
        r1, r2 = jax.random.split(rng)
        cand = jax.random.uniform(r1, (R, n_over, 2))
        logit_pts = point_sample(sel_logits[..., None], cand)[..., 0]
        _, idx = jax.lax.top_k(uncertainty(logit_pts), k_unc)
        unc_pts = jnp.take_along_axis(cand, idx[..., None].repeat(2, -1), 1)
        rand_pts = jax.random.uniform(r2, (R, P - k_unc, 2))
        return jnp.concatenate([unc_pts, rand_pts], 1)

    def _extra_mask_losses(self, losses_out, mask_out):
        labels = jnp.clip(mask_out["labels"], 0, self.num_classes - 1)
        mlogits = mask_out["mlogits"]                      # (R, 2s, 2s, C)
        sel = jnp.take_along_axis(
            mlogits, labels[:, None, None, None], axis=-1)[..., 0]
        rng = self.make_rng("sampler")
        pts = jax.lax.stop_gradient(
            self._sample_train_points(rng, jax.lax.stop_gradient(sel)))
        feats = mask_out["feats_fine"]
        rois = mask_out["pos_rois"]
        fine = sample_fine_features(feats, float(self.fine_stride), rois, pts)
        coarse = point_sample(mlogits, pts)                # (R, P, C)
        plogits = self.point_head_m(fine, coarse)
        psel = jnp.take_along_axis(plogits, labels[:, None, None],
                                   axis=-1)[..., 0]        # (R, P)
        tgt = point_sample(
            jax.lax.stop_gradient(mask_out["targets"])[..., None],
            pts)[..., 0]
        bce = (jnp.maximum(psel, 0) - psel * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(psel))))
        w = mask_out["weights"][:, None]
        losses_out["loss_point"] = (bce * w).sum() / jnp.maximum(
            w.sum() * pts.shape[1], 1.0)

    def forward_train(self, *args, **kwargs):
        return super().forward_train(*args, **kwargs)

    def _mask_train_outputs(self, feats, samples, gt_masks, gt_boxes,
                            gt_valid, tc):
        out = super()._mask_train_outputs(feats, samples, gt_masks,
                                          gt_boxes, gt_valid, tc)
        pos_cap = int(tc["rcnn"]["num_samples"] * tc["rcnn"]["pos_fraction"])
        out["feats_fine"] = feats[0]
        out["pos_rois"] = samples.rois[:, :pos_cap].reshape(-1, 5)
        return out

    def refine_masks(self, images, dets, img_shapes):
        """Test-time subdivision (`point_rend_roi_head.py refine_mask`):
        upsample the coarse mask x2 per step, re-evaluate the most
        uncertain pixels with the point head.  Returns (B, K, S, S) probs
        where S = 2 * mask_roi_size * 2**subdivision_steps."""
        feats = self.extract_feat(images, train=False)
        B, K, _ = dets.boxes.shape
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], dets.boxes],
                               axis=-1).reshape(B * K, 5)
        from .roi_head import multilevel_roi_align
        mfeats = multilevel_roi_align(feats[:4], rois,
                                      strides=self.featmap_strides,
                                      out_size=self.mask_roi_size)
        mlogits = self.mask_head_m(mfeats)
        lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            mlogits, lab[:, None, None, None], axis=-1)[..., 0]  # (R, s, s)
        R = sel.shape[0]
        for _ in range(self.subdivision_steps):
            S = sel.shape[1] * 2
            ys = (jnp.arange(S) + 0.5) / S
            xs = (jnp.arange(S) + 0.5) / S
            gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
            grid = jnp.stack([gx, gy], -1).reshape(1, -1, 2).repeat(R, 0)
            up = point_sample(sel[..., None], grid)[..., 0]     # (R, S*S)
            n_pts = min(self.num_points * 4, S * S)
            _, idx = jax.lax.top_k(uncertainty(up), n_pts)
            pts = jnp.take_along_axis(grid, idx[..., None].repeat(2, -1), 1)
            fine = sample_fine_features(feats[0], float(self.fine_stride),
                                        rois, pts)
            coarse = point_sample(mlogits, pts)
            plog = self.point_head_m(fine, coarse)
            psel = jnp.take_along_axis(plog, lab[:, None, None],
                                       axis=-1)[..., 0]
            flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(up, idx, psel)
            sel = flat.reshape(R, S, S)
        probs = jax.nn.sigmoid(sel)
        return probs.reshape(B, K, *probs.shape[1:])
