"""RoIAlign — batched bilinear pooling of RoIs from NHWC feature maps.

Replaces `mmcv.ops.roi_align` (used via
`mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:9`).
Semantics follow mmcv's `aligned=True` default (half-pixel offset,
torchvision-style continuous coordinates; samples outside [-1, H] read 0).
Fixed sampling grid: `sampling_ratio` samples per bin side (the reference
config's adaptive `sampling_ratio=0` is dynamic-shape; we default to 2,
Detectron2's fixed choice — numerically within float tolerance for mAP).

Implementation: interpolation-matrix GEMMs, not gathers.  Bilinear
RoIAlign is separable — a bin's value is mean_{ij} wy_i wx_j F[y_i, x_j]
over a product sample grid, which factorizes EXACTLY into
(1/s · Σ_i wy_i) ⊗ (1/s · Σ_j wx_j).  So each RoI's 7x7 crop is
Wy @ F @ Wx^T with small dense per-RoI weight matrices, and the whole
batch becomes two large matmuls per FPN level that run on the MXU.  On
the TPU backend XLA lowers the naive row-gather formulation to a serial
scalar loop (measured ~30 MB/s — 2.5 s/batch for the flagship's 4,000
RoIs); the GEMM form does the same math at MXU rate.  The out-of-bounds
zero mask and border clamping also factorize per axis, so results match
the gather formulation bit-for-bit in f32.
"""

from typing import Optional, Sequence

import numpy as np

# Static sample capacity for sampling_ratio=0 (mmcv adaptive) — exact vs
# the CUDA kernel when ceil(bin) <= this bound; see _roi_align_packed.
ADAPTIVE_MAX_SAMPLES = 8

import jax.numpy as jnp
from jax import lax


def _axis_weights(v1, bin_sz, o: int, s: int, size, n_cols: int,
                  col_off, dtype, g=None):
    """Dense per-RoI interpolation matrix for one axis.

    v1: (R,) continuous start coordinate on the level grid; bin_sz: (R,)
    bin extent; size: (R,) valid extent (Hl or Wl) per roi; col_off: (R,)
    column offset of this roi's image/level block inside the packed axis
    of n_cols columns.  Returns (R, o, n_cols) with
    W[r, i, col] = 1/g * Σ_samples Σ_taps w · [col == tap column], taps
    clamped to the border, samples fully outside (-1, size) zeroed —
    mmcv bilinear_interpolate semantics.

    g: None -> fixed s samples per bin (Detectron2-style).  (R,) int32 ->
    mmcv `sampling_ratio=0` adaptive counts (g[r] = ceil(bin)), realised
    fixed-shape: s is the static sample capacity and samples >= g[r] are
    masked out of the sum, so per-roi dynamic counts never change shapes.
    """
    R = v1.shape[0]
    oi = jnp.arange(o, dtype=jnp.float32)[None, :, None]            # (1, o, 1)
    si = jnp.arange(s, dtype=jnp.float32)[None, None, :]            # (1, 1, s)
    if g is None:
        offs = (si + 0.5) / s                                       # in-bin
        active = jnp.ones((R, 1, s), bool)
        denom = jnp.full((R, 1, 1), float(s), jnp.float32)
    else:
        gf = g.astype(jnp.float32)[:, None, None]                   # (R, 1, 1)
        offs = (si + 0.5) / gf
        active = si < gf
        denom = gf
    v = v1[:, None, None] + bin_sz[:, None, None] * (oi + offs)     # (R, o, s)
    sizef = size.astype(jnp.float32)[:, None, None]
    inside = (v > -1.0) & (v < sizef) & active
    vc = jnp.clip(v, 0.0, sizef - 1)
    v0 = jnp.floor(vc)
    v1i = jnp.minimum(v0 + 1, sizef - 1)
    w1 = (vc - v0) * inside
    w0 = (1.0 - (vc - v0)) * inside
    c0 = v0.astype(jnp.int32) + col_off[:, None, None]
    c1 = v1i.astype(jnp.int32) + col_off[:, None, None]

    cols = jnp.arange(n_cols, dtype=jnp.int32)
    # accumulate both taps of every sample into the dense matrix
    W = ((cols[None, None, None, :] == c0[..., None]) * w0[..., None] +
         (cols[None, None, None, :] == c1[..., None]) * w1[..., None])
    return (W.sum(axis=2) / denom).astype(dtype)                    # (R, o, n_cols)


def _crop_level(feat, Wy, Wx, chunk: int = 512):
    """crop[r] = Wy[r] @ F @ Wx[r]^T for one packed level.

    feat: (HB, WB, C) with HB = B*Hl rows packed per image (Wy columns
    select the roi's own image block); Wy: (R, o, HB); Wx: (R, o, WB).
    Chunked over R to bound the (chunk*o, WB*C) intermediate.
    """
    HB, WB, C = feat.shape
    R, o, _ = Wy.shape
    fmat = feat.reshape(HB, WB * C)

    def run(args):
        wy, wx = args
        n = wy.shape[0]
        # big MXU GEMM: (n*o, HB) @ (HB, WB*C)
        t = (wy.reshape(n * o, HB) @ fmat).reshape(n, o, WB, C)
        # per-roi small contraction over WB
        out = jnp.einsum("royc,rxy->roxc", t, wx,
                         preferred_element_type=jnp.float32)
        return out.astype(feat.dtype)

    if R <= chunk:
        return run((Wy, Wx))
    pad = (-R) % chunk
    if pad:
        Wy = jnp.concatenate([Wy, jnp.zeros((pad, o, HB), Wy.dtype)])
        Wx = jnp.concatenate([Wx, jnp.zeros((pad, o, WB), Wx.dtype)])
    n_chunks = (R + pad) // chunk
    out = lax.map(run, (Wy.reshape(n_chunks, chunk, o, HB),
                        Wx.reshape(n_chunks, chunk, o, WB)))
    return out.reshape(n_chunks * chunk, o, o, feat.shape[-1])[:R]


USE_PALLAS_CROP = None  # None = env/default; True/False to force


def _pallas_crop_enabled() -> bool:
    # Default: ON on TPU devices, OFF elsewhere.  On-chip A/B
    # (tools/bench_roi_align.py, v5e, 2026-08-18): fused Pallas crop
    # 14.4 ms vs 16.2 ms for the XLA einsum pair at flagship shapes,
    # max|diff| = 0.  CPU keeps the XLA path (Mosaic kernels don't
    # lower there; interpret mode stays a test-only entry).
    if USE_PALLAS_CROP is not None:
        return USE_PALLAS_CROP
    import os
    env = os.environ.get("PANOSWIN_PALLAS_CROP")
    if env is not None:
        return env == "1"
    import jax
    dev = jax.devices()[0]
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def _crop_level_per_image(feat, Wy, Wx, chunk: int = 512,
                          use_pallas: bool = True):
    """Per-image variant: crop[b,p] = Wy[b,p] @ F[b] @ Wx[b,p]^T.

    feat: (B, Hl, Wl, C); Wy: (B, P, o, Hl); Wx: (B, P, o, Wl).  Skips the
    generic path's batch-one-hot fold (which multiplies the big GEMM's
    contraction dim by B) — valid when rois are block-ordered per image.

    On TPU the two chained einsums are replaced by the fused Pallas crop
    kernel (ops/roi_align_pallas.py), which keeps the (B, P, o, axis2, C)
    stage-1 intermediate in VMEM instead of round-tripping ~GBs of HBM.
    use_pallas=False forces the einsum pair — at small P the Pallas
    kernel's fixed feature-slab DMAs dominate and XLA wins (measured:
    K=128 Pallas 18.7 ms vs einsum ~2 ms at flagship level-0).
    """
    if use_pallas and _pallas_crop_enabled():
        import jax
        from .roi_align_pallas import fused_crop_per_image, supports
        if supports(feat, Wy, Wx):
            # Mosaic only lowers on TPU; interpret elsewhere (tests force
            # the pallas path on via USE_PALLAS_CROP / the env knob)
            return fused_crop_per_image(
                feat, Wy, Wx, 16, jax.devices()[0].platform != "tpu")
    B, Hl, Wl, C = feat.shape
    _, P, o, _ = Wy.shape

    def run(args):
        wy, wx = args
        # NOTE: contracting the wider (w) axis first looked 1.5x better in
        # an isolated microbench but measured 3x WORSE inside the full
        # multilevel op (90 vs 28 ms) — XLA's layout/fusion choices differ
        # in context; keep h-first
        t = jnp.einsum("bpoh,bhwc->bpowc", wy, feat,
                       preferred_element_type=jnp.float32).astype(feat.dtype)
        return jnp.einsum("bpxw,bpowc->bpoxc", wx, t,
                          preferred_element_type=jnp.float32).astype(feat.dtype)

    if P <= chunk:
        return run((Wy, Wx))
    pad = (-P) % chunk
    if pad:
        Wy = jnp.concatenate(
            [Wy, jnp.zeros((B, pad, o, Hl), Wy.dtype)], axis=1)
        Wx = jnp.concatenate(
            [Wx, jnp.zeros((B, pad, o, Wl), Wx.dtype)], axis=1)
    n_chunks = (P + pad) // chunk
    out = lax.map(run, (Wy.reshape(B, n_chunks, chunk, o, Hl).transpose(1, 0, 2, 3, 4),
                        Wx.reshape(B, n_chunks, chunk, o, Wl).transpose(1, 0, 2, 3, 4)))
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(B, n_chunks * chunk, o, o, C)
    return out[:, :P]


def _windowed_supported(levels, o, chunk: int = 8) -> bool:
    """Static eligibility of the windowed Pallas crop: lane-aligned C
    (the kernel's VMEM reshapes split the minor dim at C), an output
    size whose per-bin span can fit the window for in-band rois, and a
    VMEM footprint (patch scratch + output block + weight blocks) under
    a ~10 MB budget — Mosaic fails compile, not falls back, when the
    scratch does not fit, so this must be checked statically."""
    from .roi_align_pallas import SY_WIN, SX_WIN
    C = levels[0].shape[-1]
    itemsize = jnp.dtype(levels[0].dtype).itemsize
    vmem = (2 * chunk * SY_WIN * SX_WIN * C      # double-buffered scratch
            + 2 * chunk * o * o * C              # pipelined output block
            + 2 * chunk * o * (SY_WIN + SX_WIN)) * itemsize
    return (C % 128 == 0 and o <= 16 and len(levels) <= 4
            and vmem <= 12 * 2 ** 20)


def _pad_h(h: int) -> int:
    """Windowed-crop padded H extent of a level (window must fit)."""
    from .roi_align_pallas import SY_WIN
    return max(h, SY_WIN)


def _pad_w(w: int) -> int:
    """Windowed-crop padded W extent: window must fit AND the extent must
    be a multiple of SX_ALIGN so the clipped-then-aligned x origin stays
    within [0, W - SX_WIN] (both bounds multiples of SX_ALIGN)."""
    from .roi_align_pallas import SX_WIN, SX_ALIGN
    return max(-(-w // SX_ALIGN) * SX_ALIGN, SX_WIN)


def _dense_multilevel(levels, Wy_all, Wx_all, level_of_roi, o, per_image):
    """Reference dense per-level einsum crop (summed over level-masked
    weights) — the fallback branch AND the formulation every gradient is
    computed through."""
    B = levels[0].shape[0]
    C = levels[0].shape[-1]
    R = Wy_all.shape[0]
    dtype = levels[0].dtype
    out = jnp.zeros((R, o, o, C), dtype)
    for l, feat in enumerate(levels):
        Hl, Wl = feat.shape[1], feat.shape[2]
        sel = (level_of_roi == l).astype(dtype)
        Wy = Wy_all[:, :, :Hl] * sel[:, None, None]
        Wx = Wx_all[:, :, :Wl]
        crop = _crop_level_per_image(
            feat, Wy.reshape(B, per_image, o, Hl),
            Wx.reshape(B, per_image, o, Wl))
        out = out + crop.reshape(R, o, o, C)
    return out


def _float0(x):
    import jax
    return np.zeros(np.shape(x), jax.dtypes.float0) \
        if not jnp.issubdtype(jnp.result_type(x), jnp.floating) \
        else jnp.zeros_like(x)


def _overflow_budget(per_image: int) -> int:
    """Static PER-IMAGE slot budget K for the hybrid's dense overflow pass
    (oversized-span RoIs that the windowed kernel cannot cover).  Sized so
    the K-bounded dense pass stays well under the full dense cost while
    covering the measured ~20% overflow fraction of realistic RPN
    proposal mixes (tools/bench_roi_align.py) with margin."""
    return min(per_image, max(64, -(-(per_image // 4) // 64) * 64))


def _hybrid_forward(static, levels, Wy_all, Wx_all, level_of_roi, ok,
                    y0, x0, W1w, W2w):
    """ok: (R,) per-RoI window-eligibility.  RoIs with ok run through the
    windowed Pallas crop; the few oversized ones (degenerate aspect
    ratios whose span on their own level exceeds the window) are compacted
    into K static slots with a one-hot matmul (no gathers — XLA lowers
    gathers to a serial scalar loop on this backend) and pooled through
    the dense einsum path at K-bounded cost; a full dense fallback runs
    only when more than K RoIs overflow."""
    import jax
    from .roi_align_pallas import windowed_crop, SY_WIN, SX_WIN
    o, per_image = static
    B = levels[0].shape[0]
    C = levels[0].shape[-1]
    R = Wy_all.shape[0]
    Hmax = Wy_all.shape[2]
    Wmax = Wx_all.shape[2]
    dtype = levels[0].dtype
    K = _overflow_budget(per_image)

    notok = jnp.logical_not(ok)
    n_over = notok.reshape(B, per_image).sum(axis=1).max()

    def windowed():
        padded = [jnp.pad(f, ((0, 0), (0, _pad_h(f.shape[1]) - f.shape[1]),
                              (0, _pad_w(f.shape[2]) - f.shape[2]), (0, 0)))
                  for f in levels]
        interp = jax.devices()[0].platform != "tpu"
        crop = windowed_crop(
            list(padded), level_of_roi.reshape(B, per_image),
            y0.reshape(B, per_image), x0.reshape(B, per_image),
            W1w.reshape(B, per_image, o, SY_WIN),
            W2w.reshape(B, per_image, o, SX_WIN), o, interpret=interp)
        return crop.reshape(-1, o, o, C)

    def hybrid(_):
        win = windowed()
        # compact each image's <= K oversized RoIs into static slots:
        # S[b, k, p] = 1 iff p is the k-th oversized roi of image b
        # (one-hot matmuls, MXU-friendly — no gathers), then pool the
        # compacted set through the per-image dense machinery at
        # K-bounded cost and scatter back with the transposed one-hot.
        no2 = notok.reshape(B, per_image)
        pos = jnp.cumsum(no2.astype(jnp.int32), axis=1) - 1
        S = ((pos[:, None, :] == jnp.arange(K, dtype=jnp.int32)[None, :, None])
             & no2[:, None, :]).astype(jnp.float32)       # (B, K, per_image)
        Wy_k = jnp.einsum(
            "bkp,bpm->bkm", S,
            Wy_all.reshape(B, per_image, -1).astype(jnp.float32)
        ).reshape(B, K, o, Hmax).astype(dtype)
        Wx_k = jnp.einsum(
            "bkp,bpm->bkm", S,
            Wx_all.reshape(B, per_image, -1).astype(jnp.float32)
        ).reshape(B, K, o, Wmax).astype(dtype)
        lvl_k = jnp.round(jnp.einsum(
            "bkp,bp->bk", S,
            level_of_roi.reshape(B, per_image).astype(jnp.float32)))
        out_k = jnp.zeros((B, K, o, o, C), dtype)
        for l, feat in enumerate(levels):
            Hl, Wl = feat.shape[1], feat.shape[2]
            sel = (lvl_k == l).astype(dtype)
            out_k = out_k + _crop_level_per_image(
                feat, Wy_k[:, :, :, :Hl] * sel[:, :, None, None],
                Wx_k[:, :, :, :Wl], use_pallas=False)
        over = jnp.einsum("bkp,bkxyc->bpxyc", S,
                          out_k.astype(jnp.float32)).astype(dtype)
        return jnp.where(ok[:, None, None, None], win,
                         over.reshape(R, o, o, C))

    def dense(_):
        return _dense_multilevel(levels, Wy_all, Wx_all, level_of_roi, o,
                                 per_image)

    return lax.cond(n_over <= K, hybrid, dense, operand=None)


import functools as _functools
import jax as _jax


@_functools.partial(_jax.custom_vjp, nondiff_argnums=(0,))
def _hybrid_crop(static, levels, Wy_all, Wx_all, level_of_roi, ok,
                 y0, x0, W1w, W2w):
    """Windowed Pallas crop with per-RoI eligibility (`ok`: (R,) bool),
    a K-bounded dense pass for oversized RoIs, and a full dense fallback
    when more than K overflow.  All paths compute the same values (same
    weights, same f32-accumulate + dtype cast between stages), so the VJP
    is taken through the dense einsum formulation — feature and
    roi-coordinate gradients match the plain dense path."""
    return _hybrid_forward(static, levels, Wy_all, Wx_all, level_of_roi,
                           ok, y0, x0, W1w, W2w)


def _hybrid_fwd(static, levels, Wy_all, Wx_all, level_of_roi, ok,
                y0, x0, W1w, W2w):
    out = _hybrid_forward(static, levels, Wy_all, Wx_all, level_of_roi,
                          ok, y0, x0, W1w, W2w)
    return out, (levels, Wy_all, Wx_all, level_of_roi, ok, y0, x0, W1w, W2w)


def _hybrid_bwd(static, res, g):
    import jax
    levels, Wy_all, Wx_all, level_of_roi, ok, y0, x0, W1w, W2w = res
    o, per_image = static
    _, vjp = jax.vjp(
        lambda lv, wy, wx: _dense_multilevel(lv, wy, wx, level_of_roi, o,
                                             per_image),
        levels, Wy_all, Wx_all)
    d_levels, d_wy, d_wx = vjp(g)
    return (d_levels, d_wy, d_wx, _float0(level_of_roi), _float0(ok),
            _float0(y0), _float0(x0), jnp.zeros_like(W1w),
            jnp.zeros_like(W2w))


_hybrid_crop.defvjp(_hybrid_fwd, _hybrid_bwd)


def _roi_align_packed(levels, rois, level_of_roi, inv_strides, out_size,
                      sampling_ratio, aligned, per_image=None,
                      adaptive_max=ADAPTIVE_MAX_SAMPLES):
    """Shared core: levels is a list of (B, Hl, Wl, C) maps; every roi is
    pooled from `levels[level_of_roi[r]]` at scale inv_strides[r].

    per_image: static RoI count per image.  When given (and R == B *
    per_image), rois are taken as block-ordered by image — the layout
    every detector in this codebase produces via `rois.reshape(B*P, 5)` —
    and the batch one-hot fold is skipped (4x fewer MXU FLOPs at B=4).

    sampling_ratio=0 is mmcv's adaptive grid (ceil(bin) samples per bin
    side), realised fixed-shape with `adaptive_max` static sample capacity
    and per-roi masking — exact vs the CUDA kernel whenever
    ceil(bin) <= adaptive_max (FPN level routing keeps bins < 4 except for
    degenerate aspect ratios).
    """
    B = levels[0].shape[0]
    C = levels[0].shape[-1]
    R = rois.shape[0]
    o = out_size
    adaptive = sampling_ratio == 0
    s = adaptive_max if adaptive else max(sampling_ratio, 1)
    dtype = levels[0].dtype

    offset = 0.5 if aligned else 0.0
    bidx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * inv_strides - offset
    y1 = rois[:, 2] * inv_strides - offset
    roi_w = (rois[:, 3] - rois[:, 1]) * inv_strides
    roi_h = (rois[:, 4] - rois[:, 2]) * inv_strides
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / o
    bin_h = roi_h / o
    if adaptive:
        gy = jnp.clip(jnp.ceil(bin_h), 1, s).astype(jnp.int32)
        gx = jnp.clip(jnp.ceil(bin_w), 1, s).astype(jnp.int32)
    else:
        gy = gx = None

    use_per_image = per_image is not None and R == B * per_image
    out = jnp.zeros((R, o, o, C), dtype)

    if use_per_image:
        # build ONE weight matrix per axis at the widest level's extent
        # (per-roi coords/extents are already on the roi's own level, and
        # a level-l roi's nonzero columns lie within [0, Hl)), then slice
        # columns per level — 2 builds instead of 2 * n_levels
        Hmax = max(f.shape[1] for f in levels)
        Wmax = max(f.shape[2] for f in levels)
        Hv = jnp.zeros((R,), jnp.int32)
        Wv = jnp.zeros((R,), jnp.int32)
        for l, f in enumerate(levels):
            onl = level_of_roi == l
            Hv = jnp.where(onl, f.shape[1], Hv)
            Wv = jnp.where(onl, f.shape[2], Wv)
        Wy_all = _axis_weights(y1, bin_h, o, s, Hv, Hmax,
                               jnp.zeros_like(bidx), dtype, g=gy)
        Wx_all = _axis_weights(x1, bin_w, o, s, Wv, Wmax,
                               jnp.zeros_like(bidx), dtype, g=gx)
        if _pallas_crop_enabled() and _windowed_supported(levels, o):
            from .roi_align_pallas import SY_WIN, SX_WIN, SX_ALIGN
            # padded extents of the roi's own level (match _hybrid_forward)
            Hp = jnp.zeros_like(Hv)
            Wp = jnp.zeros_like(Wv)
            for l, f in enumerate(levels):
                onl = level_of_roi == l
                Hp = jnp.where(onl, _pad_h(f.shape[1]), Hp)
                Wp = jnp.where(onl, _pad_w(f.shape[2]), Wp)
            y0 = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0, Hp - SY_WIN)
            x0 = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0, Wp - SX_WIN)
            # x origin aligned DOWN to the Mosaic tile (second-to-minor dim
            # slices must be provably 8-divisible); the wider SX_WIN window
            # absorbs the <= SX_ALIGN-1 px slack.  Still <= Wp - SX_WIN
            # because that bound is itself a multiple of SX_ALIGN.
            x0 = (x0 // SX_ALIGN) * SX_ALIGN
            # window covers a roi iff its level map fits entirely or the
            # sampled span (+taps, +alignment slack) does — PER-ROI; the
            # few oversized ones go through the K-bounded dense overflow
            # pass inside _hybrid_crop instead of forfeiting the whole
            # batch's fast path
            ok = (((Hv <= SY_WIN) | (bin_h * o <= SY_WIN - 4)) &
                  ((Wv <= SX_WIN) | (bin_w * o <= SX_WIN - 11)))
            W1w = _axis_weights(y1, bin_h, o, s, Hv, SY_WIN, -y0, dtype, g=gy)
            W2w = _axis_weights(x1, bin_w, o, s, Wv, SX_WIN, -x0, dtype, g=gx)
            return _hybrid_crop(
                (o, per_image), tuple(levels), Wy_all, Wx_all,
                level_of_roi, ok, y0, x0, W1w, W2w).reshape(R, o, o, C)
        for l, feat in enumerate(levels):
            Hl, Wl = feat.shape[1], feat.shape[2]
            sel = (level_of_roi == l).astype(dtype)
            Wy = Wy_all[:, :, :Hl] * sel[:, None, None]
            Wx = Wx_all[:, :, :Wl]
            crop = _crop_level_per_image(
                feat, Wy.reshape(B, per_image, o, Hl),
                Wx.reshape(B, per_image, o, Wl))
            out = out + crop.reshape(R, o, o, C)
        return out

    for l, feat in enumerate(levels):
        Hl, Wl = feat.shape[1], feat.shape[2]
        sel = (level_of_roi == l).astype(jnp.float32)
        Hv = jnp.full((R,), Hl, jnp.int32)
        Wv = jnp.full((R,), Wl, jnp.int32)
        # batch block offset folds image selection into the y axis;
        # off-level rois get zero weight rows (sel factor)
        Wy = _axis_weights(y1, bin_h, o, s, Hv, B * Hl, bidx * Hl, dtype,
                           g=gy)
        Wy = Wy * sel[:, None, None].astype(dtype)
        Wx = _axis_weights(x1, bin_w, o, s, Wv, Wl, jnp.zeros_like(bidx),
                           dtype, g=gx)
        packed = feat.reshape(B * Hl, Wl, C)
        out = out + _crop_level(packed, Wy, Wx)
    return out


def roi_align(feats: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """feats: (B, H, W, C); rois: (R, 5) = (batch_idx, x1, y1, x2, y2) in
    image coords.  Returns (R, out_size, out_size, C)."""
    R = rois.shape[0]
    inv = jnp.full((R,), spatial_scale, jnp.float32)
    lvl = jnp.zeros((R,), jnp.int32)
    return _roi_align_packed([feats], rois, lvl, inv, out_size,
                             sampling_ratio, aligned)


def window_engage_stats(feat_hw, rois, strides=(4, 8, 16, 32),
                        out_size: int = 7, finest_scale: int = 56,
                        aligned: bool = True, per_image: Optional[int] = None):
    """Host-side (numpy) diagnostic: how often the windowed Pallas crop
    engages on a given RoI set.

    Mirrors `multilevel_roi_align`'s level routing (incl. the wide-map
    transpose) and `_roi_align_packed`'s per-RoI window-eligibility
    predicate.  feat_hw: list of (Hl, Wl) level extents; rois: (R, 5)
    numpy array.  Returns dict with the ok fraction, the overflow count
    vs the K budget, and which runtime branch the hybrid takes.
    """
    from .roi_align_pallas import SY_WIN, SX_WIN
    rois = np.asarray(rois, np.float32)
    R = rois.shape[0]
    L = len(feat_hw)
    transposed = sum(w for _, w in feat_hw) > sum(h for h, _ in feat_hw)
    w_roi = rois[:, 3] - rois[:, 1]
    h_roi = rois[:, 4] - rois[:, 2]
    if transposed:
        w_roi, h_roi = h_roi, w_roi
        feat_hw = [(w, h) for h, w in feat_hw]
    scale_sz = np.sqrt(np.clip(w_roi * h_roi, 0.0, None))
    lvl = np.clip(np.floor(np.log2(scale_sz / finest_scale + 1e-6)
                           ).astype(np.int32), 0, L - 1)
    inv = np.array([1.0 / s for s in strides], np.float32)[lvl]
    span_y = h_roi * inv
    span_x = w_roi * inv
    if not aligned:
        span_y = np.maximum(span_y, 1.0)
        span_x = np.maximum(span_x, 1.0)
    Hv = np.array([h for h, _ in feat_hw], np.int32)[lvl]
    Wv = np.array([w for _, w in feat_hw], np.int32)[lvl]
    ok = (((Hv <= SY_WIN) | (span_y <= SY_WIN - 4)) &
          ((Wv <= SX_WIN) | (span_x <= SX_WIN - 11)))
    P = per_image if per_image else R
    n_over = int((~ok).reshape(-1, P).sum(axis=1).max()) if R else 0
    K = _overflow_budget(P)
    return {
        "n_rois": R,
        "ok_fraction": float(ok.mean()) if R else 1.0,
        "max_over_per_image": n_over,
        "overflow_budget": K,
        "branch": "windowed+K-dense" if n_over <= K else "full-dense",
    }


def multilevel_roi_align(feats, rois: jnp.ndarray, strides=(4, 8, 16, 32),
                         out_size: int = 7, finest_scale: int = 56,
                         sampling_ratio: int = 2,
                         aligned: bool = True,
                         per_image: Optional[int] = None) -> jnp.ndarray:
    """FPN-level-routed RoIAlign as per-level interpolation-matrix GEMMs.

    `SingleRoIExtractor` semantics (`single_level_roi_extractor.py:9`):
    lvl = clamp(floor(log2(sqrt(area)/finest_scale + 1e-6))).

    feats: list of (B, Hi, Wi, C); rois: (R, 5) image-coord
    (batch, x1, y1, x2, y2).  Returns (R, out_size, out_size, C).
    """
    L = len(feats)
    if sum(f.shape[2] for f in feats) > sum(f.shape[1] for f in feats):
        # wide (e.g. 2:1 pano) maps: contract the W axis first by running
        # the same kernel on transposed maps with x/y-swapped rois.  The
        # stage-1 intermediate t = (B, P, o, axis2, C) is proportional to
        # the SECOND spatial axis, and this op is bandwidth-bound on t —
        # measured 26.4 -> 16.0 ms for the flagship's 4,000 RoIs
        # (tools/bench_roi_align.py); the extra transposes are cheap
        # layout ops
        ft = [f.transpose(0, 2, 1, 3) for f in feats]
        rt = jnp.stack([rois[:, 0], rois[:, 2], rois[:, 1],
                        rois[:, 4], rois[:, 3]], axis=1)
        crop = multilevel_roi_align(
            ft, rt, strides=strides, out_size=out_size,
            finest_scale=finest_scale, sampling_ratio=sampling_ratio,
            aligned=aligned, per_image=per_image)
        return crop.transpose(0, 2, 1, 3)
    w_roi = rois[:, 3] - rois[:, 1]
    h_roi = rois[:, 4] - rois[:, 2]
    scale_sz = jnp.sqrt(jnp.clip(w_roi * h_roi, 0.0, None))
    lvl = jnp.floor(jnp.log2(scale_sz / finest_scale + 1e-6)).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, L - 1)
    # per-roi 1/stride without a gather (even tiny gathers serialize)
    inv = jnp.zeros(lvl.shape, jnp.float32)
    for l in range(L):
        inv = jnp.where(lvl == l, 1.0 / float(strides[l]), inv)
    return _roi_align_packed(list(feats), rois, lvl, inv, out_size,
                             sampling_ratio, aligned, per_image=per_image)


def deform_roi_pool(feats, rois: jnp.ndarray, offsets: jnp.ndarray,
                    strides=(4, 8, 16, 32), out_size: int = 7,
                    finest_scale: int = 56, sampling_ratio: int = 2,
                    gamma: float = 0.1) -> jnp.ndarray:
    """Deformable RoI pooling (`mmcv.ops.DeformRoIPool` role, the
    configs/dcn *_dpool recipes): every output bin is shifted by a
    learned offset scaled by gamma * roi size before pooling.

    Formulated TPU-natively: each shifted bin IS a 1-bin RoI, so the op
    expands to R*out_size^2 single-bin RoIs routed at the PARENT roi's
    pyramid level and runs through the same interpolation-matrix GEMM
    kernel as standard RoIAlign — identical FLOPs, no gathers.

    offsets: (R, o, o, 2) as (dy, dx) in roi-normalized units (the
    offset-fc output); rois: (R, 5) = (batch, x1, y1, x2, y2).
    """
    R = rois.shape[0]
    o = out_size
    L = len(feats)
    w_roi = rois[:, 3] - rois[:, 1]
    h_roi = rois[:, 4] - rois[:, 2]
    scale_sz = jnp.sqrt(jnp.clip(w_roi * h_roi, 0.0, None))
    lvl = jnp.floor(jnp.log2(scale_sz / finest_scale + 1e-6)).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, L - 1)
    inv = jnp.zeros(lvl.shape, jnp.float32)
    for l in range(L):
        inv = jnp.where(lvl == l, 1.0 / float(strides[l]), inv)

    bw = (w_roi / o)[:, None, None]
    bh = (h_roi / o)[:, None, None]
    jj = jnp.arange(o, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(o, dtype=jnp.float32)[None, :, None]
    dy = offsets[..., 0] * gamma * h_roi[:, None, None]
    dx = offsets[..., 1] * gamma * w_roi[:, None, None]
    x1b = rois[:, 1][:, None, None] + jj * bw + dx
    y1b = rois[:, 2][:, None, None] + ii * bh + dy
    bidx = jnp.broadcast_to(rois[:, 0][:, None, None], x1b.shape)
    bin_rois = jnp.stack([bidx, x1b, y1b, x1b + bw, y1b + bh],
                         axis=-1).reshape(R * o * o, 5)
    lvl_b = jnp.repeat(lvl, o * o)
    inv_b = jnp.repeat(inv, o * o)
    crop = _roi_align_packed(list(feats), bin_rois, lvl_b, inv_b, 1,
                             sampling_ratio, True, per_image=None)
    return crop.reshape(R, o, o, feats[0].shape[-1])


def generic_roi_align(feats, rois: jnp.ndarray, strides=(4, 8, 16, 32),
                      out_size: int = 7, sampling_ratio: int = 2,
                      aligned: bool = True) -> jnp.ndarray:
    """GRoIE-style generic RoI extraction (`mmdet GenericRoIExtractor`,
    configs/groie): every RoI is pooled from EVERY pyramid level at that
    level's scale and the crops are summed (the extractor's 'sum'
    aggregation; the reference's optional pre/post attention modules live
    in the head configs)."""
    out = None
    for stride, feat in zip(strides, feats):
        crop = roi_align(feat, rois, out_size=out_size,
                         spatial_scale=1.0 / stride,
                         sampling_ratio=sampling_ratio, aligned=aligned)
        out = crop if out is None else out + crop
    return out
