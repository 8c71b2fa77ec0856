"""RoIAlign — batched bilinear pooling of RoIs from NHWC feature maps.

Replaces `mmcv.ops.roi_align` (used via
`mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:9`).
Semantics follow mmcv's `aligned=True` default (half-pixel offset,
torchvision-style continuous coordinates; samples outside [-1, H] read 0).
Fixed sampling grid: `sampling_ratio` samples per bin side (the reference
config's adaptive `sampling_ratio=0` is dynamic-shape; we default to 2,
Detectron2's fixed choice — numerically within float tolerance for mAP).

Implementation: one flat gather over (B*H*W, C) with indices computed for
all (roi, bin, sample, corner) at once — XLA lowers this to a single fused
dynamic-gather, no per-roi loops.
"""

import jax
import jax.numpy as jnp


def roi_align(feats: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """feats: (B, H, W, C); rois: (R, 5) = (batch_idx, x1, y1, x2, y2) in
    image coords.  Returns (R, out_size, out_size, C)."""
    B, H, W, C = feats.shape
    R = rois.shape[0]
    o = out_size
    s = max(sampling_ratio, 1)

    offset = 0.5 if aligned else 0.0
    bidx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / o
    bin_h = roi_h / o

    # sample coordinates: (R, o, s) each axis
    grid = (jnp.arange(o, dtype=feats.dtype)[None, :, None] +
            (jnp.arange(s, dtype=feats.dtype)[None, None, :] + 0.5) / s)
    ys = y1[:, None, None] + bin_h[:, None, None] * grid      # (R, o, s)
    xs = x1[:, None, None] + bin_w[:, None, None] * grid

    def corners(v, size):
        inside = (v > -1.0) & (v < size)
        vc = jnp.clip(v, 0.0, size - 1)
        v0 = jnp.floor(vc)
        v1 = jnp.minimum(v0 + 1, size - 1)
        w1 = vc - v0
        return v0.astype(jnp.int32), v1.astype(jnp.int32), w1, inside

    y0, y1i, wy, in_y = corners(ys, H)
    x0, x1i, wx, in_x = corners(xs, W)

    flat = feats.reshape(B * H * W, C)
    base = (bidx * H * W)[:, None, None, None, None]          # (R,1,1,1,1)

    def gather(yi, xi):
        # yi: (R, o, s) -> broadcast against xi (R, o, s) on separate axes
        idx = base + yi[:, :, None, :, None] * W + xi[:, None, :, None, :]
        # idx: (R, o, o, s, s)
        return flat[idx.reshape(-1)].reshape(R, o, o, s, s, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1i)
    v10 = gather(y1i, x0)
    v11 = gather(y1i, x1i)

    wy_ = wy[:, :, None, :, None]
    wx_ = wx[:, None, :, None, :]
    val = (v00 * ((1 - wy_) * (1 - wx_))[..., None] +
           v01 * ((1 - wy_) * wx_)[..., None] +
           v10 * (wy_ * (1 - wx_))[..., None] +
           v11 * (wy_ * wx_)[..., None])
    inside = (in_y[:, :, None, :, None] & in_x[:, None, :, None, :])
    val = jnp.where(inside[..., None], val, 0.0)
    return val.mean(axis=(3, 4))


def multilevel_roi_align(feats, rois: jnp.ndarray, strides=(4, 8, 16, 32),
                         out_size: int = 7, finest_scale: int = 56,
                         sampling_ratio: int = 2,
                         aligned: bool = True) -> jnp.ndarray:
    """FPN-level-routed RoIAlign as ONE fused gather.

    `SingleRoIExtractor` semantics (`single_level_roi_extractor.py:9`):
    lvl = clamp(floor(log2(sqrt(area)/finest_scale + 1e-6))).  All levels
    are concatenated into a single flat (B * sum(Hi*Wi), C) buffer and each
    RoI's sample indices are computed against its own level's offset/stride
    — 1x gather traffic instead of running RoIAlign on every level and
    masking (4x).

    feats: list of (B, Hi, Wi, C); rois: (R, 5) image-coord
    (batch, x1, y1, x2, y2).  Returns (R, out_size, out_size, C).
    """
    import numpy as np
    B, _, _, C = feats[0].shape
    L = len(feats)
    o = out_size
    s = max(sampling_ratio, 1)
    R = rois.shape[0]

    hs = np.array([f.shape[1] for f in feats])
    ws_ = np.array([f.shape[2] for f in feats])
    sizes = hs * ws_
    level_off = np.concatenate([[0], np.cumsum(sizes)])[:L]
    total = int(sizes.sum())
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    flat = flat.reshape(B * total, C)

    w_roi = rois[:, 3] - rois[:, 1]
    h_roi = rois[:, 4] - rois[:, 2]
    scale_sz = jnp.sqrt(jnp.clip(w_roi * h_roi, 0.0, None))
    lvl = jnp.floor(jnp.log2(scale_sz / finest_scale + 1e-6)).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, L - 1)

    inv_stride = jnp.asarray(1.0 / np.asarray(strides, np.float32))[lvl]   # (R,)
    Hl = jnp.asarray(hs, jnp.int32)[lvl]
    Wl = jnp.asarray(ws_, jnp.int32)[lvl]
    off = jnp.asarray(level_off, jnp.int32)[lvl]
    bidx = rois[:, 0].astype(jnp.int32)

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * inv_stride - offset
    y1 = rois[:, 2] * inv_stride - offset
    bin_w = (rois[:, 3] - rois[:, 1]) * inv_stride / o
    bin_h = (rois[:, 4] - rois[:, 2]) * inv_stride / o

    grid = (jnp.arange(o, dtype=jnp.float32)[None, :, None] +
            (jnp.arange(s, dtype=jnp.float32)[None, None, :] + 0.5) / s)
    ys = y1[:, None, None] + bin_h[:, None, None] * grid       # (R, o, s)
    xs = x1[:, None, None] + bin_w[:, None, None] * grid

    def corners(v, size):
        sizef = size.astype(jnp.float32)[:, None, None]
        inside = (v > -1.0) & (v < sizef)
        vc = jnp.clip(v, 0.0, sizef - 1)
        v0 = jnp.floor(vc)
        v1 = jnp.minimum(v0 + 1, sizef - 1)
        return v0.astype(jnp.int32), v1.astype(jnp.int32), vc - v0, inside

    y0, y1i, wy, in_y = corners(ys, Hl)
    x0, x1i, wx, in_x = corners(xs, Wl)

    base = (bidx * total + off)[:, None, None, None, None]     # (R,1,1,1,1)
    Wl_ = Wl[:, None, None, None, None]

    def gather(yi, xi):
        idx = base + yi[:, :, None, :, None] * Wl_ + xi[:, None, :, None, :]
        return flat[idx.reshape(-1)].reshape(R, o, o, s, s, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1i)
    v10 = gather(y1i, x0)
    v11 = gather(y1i, x1i)

    wy_ = wy[:, :, None, :, None]
    wx_ = wx[:, None, :, None, :]
    val = (v00 * ((1 - wy_) * (1 - wx_))[..., None] +
           v01 * ((1 - wy_) * wx_)[..., None] +
           v10 * (wy_ * (1 - wx_))[..., None] +
           v11 * (wy_ * wx_)[..., None])
    inside = (in_y[:, :, None, :, None] & in_x[:, None, :, None, :])
    val = jnp.where(inside[..., None], val, 0.0)
    return val.mean(axis=(3, 4))
