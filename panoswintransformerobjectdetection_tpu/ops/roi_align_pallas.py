"""Fused Pallas RoIAlign crop: both interpolation GEMMs in one kernel.

The XLA formulation in `ops.roi_align._crop_level_per_image` materializes
the stage-1 intermediate t = Wy @ F in HBM — (B, P, o, axis2, C), ~1.8 GB
bf16 at the flagship's 4,000 RoIs on the finest level — and reads it back
for stage 2, which makes multilevel RoIAlign HBM-bound (~10 of its 16 ms
is t traffic).  This kernel keeps t in VMEM:

  grid (B, C-tiles, roi-chunks); per step the level's feature slab
  (Hl, Wl*Ct) sits in VMEM scratch (manually DMA'd once per (b, ct) —
  auto block double-buffering would not fit the 16 MB VMEM at level 0),
  stage 1 is ONE MXU GEMM (o*chunk, Hl) @ (Hl, Wl*Ct), and stage 2
  contracts Wl with a block-diagonal Wx built from static concats —
  o GEMMs of (chunk*o, chunk*Wl) @ (chunk*Wl, Ct) per step.

Layout notes (Mosaic): Ct = 128 keeps every reshape tile-preserving —
(M, Wl*128) -> (M, Wl, 128) splits the minor dim at the lane width and
(a, b, 128) -> (a*b, 128) collapses leading dims; neither moves data.
Wy rows are pre-permuted to (o, chunk) i-major so stage-2 slices are
contiguous.  HBM traffic: F once per (b, ct), weights, outputs — the
t intermediate never leaves VMEM.

Semantics are identical to `_crop_level_per_image` (validated by
tests/test_roi_align_pallas.py and the in-tree parity check in
tools/bench_roi_align.py):

  out[b,p,i,x,c] = sum_{h,w} Wy[b,p,i,h] * Wx[b,p,x,w] * F[b,h,w,c]

Backward: custom VJP that recomputes through the XLA einsum pair (same
cost as the old forward; RoI-weight grads flow exactly as before).
Replaces the mmcv `roi_align` CUDA kernel's role
(`mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:9`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT = 128  # lane width; keeps all in-kernel reshapes tile-preserving


def _xla_crop(feat, Wy, Wx):
    t = jnp.einsum("bpoh,bhwc->bpowc", Wy, feat,
                   preferred_element_type=jnp.float32).astype(feat.dtype)
    return jnp.einsum("bpxw,bpowc->bpoxc", Wx, t,
                      preferred_element_type=jnp.float32).astype(feat.dtype)


def _kernel(F_hbm, W1_ref, W2_ref, o_ref, F_s, sem, *, o, chunk, Wl):
    b = pl.program_id(0)
    c = pl.program_id(1)
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(F_hbm.at[b, c], F_s, sem)
        cp.start()
        cp.wait()

    W1 = W1_ref[0, 0]                                    # (o*chunk, Hl)
    t = jax.lax.dot_general(
        W1, F_s[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (o*chunk, Wl*CT)
    t = t.astype(o_ref.dtype).reshape(o * chunk, Wl, CT)

    # block-diagonal Wx (chunk*o, chunk*Wl): rows (p, x), cols (p, w)
    rows = []
    for p in range(chunk):
        blk = W2_ref[0, 0, p]                            # (o, Wl)
        parts = []
        if p:
            parts.append(jnp.zeros((o, p * Wl), blk.dtype))
        parts.append(blk)
        if p + 1 < chunk:
            parts.append(jnp.zeros((o, (chunk - 1 - p) * Wl), blk.dtype))
        rows.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else blk)
    BD = jnp.concatenate(rows, axis=0)

    for i in range(o):
        Ti = t[i * chunk:(i + 1) * chunk].reshape(chunk * Wl, CT)
        oi = jax.lax.dot_general(
            BD, Ti, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (chunk*o, CT)
        o_ref[0, 0, 0, :, i] = oi.reshape(chunk, o, CT).astype(o_ref.dtype)


def _forward(feat, Wy, Wx, chunk, interpret):
    B, Hl, Wl, C = feat.shape
    _, P, o, _ = Wy.shape
    nct = C // CT
    pad = (-P) % chunk
    if pad:
        Wy = jnp.concatenate(
            [Wy, jnp.zeros((B, pad, o, Hl), Wy.dtype)], axis=1)
        Wx = jnp.concatenate(
            [Wx, jnp.zeros((B, pad, o, Wl), Wx.dtype)], axis=1)
    nr = (P + pad) // chunk

    # C-tiled feature slabs: (B, nct, Hl, Wl*CT)
    F_in = feat.reshape(B, Hl, Wl, nct, CT).transpose(0, 3, 1, 2, 4)
    F_in = F_in.reshape(B, nct, Hl, Wl * CT)
    # stage-1 weights i-major per chunk: (B, nr, o*chunk, Hl)
    W1 = Wy.reshape(B, nr, chunk, o, Hl).transpose(0, 1, 3, 2, 4)
    W1 = W1.reshape(B, nr, o * chunk, Hl)
    W2 = Wx.reshape(B, nr, chunk, o, Wl)

    out = pl.pallas_call(
        functools.partial(_kernel, o=o, chunk=chunk, Wl=Wl),
        out_shape=jax.ShapeDtypeStruct(
            (B, nct, nr, chunk, o, o, CT), feat.dtype),
        grid=(B, nct, nr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, o * chunk, Hl),
                         lambda b, c, r: (b, r, 0, 0)),
            pl.BlockSpec((1, 1, chunk, o, Wl),
                         lambda b, c, r: (b, r, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, chunk, o, o, CT),
                               lambda b, c, r: (b, c, r, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hl, Wl * CT), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(F_in, W1, W2)
    # (B, nct, nr, chunk, o, o, CT) -> (B, P, o, o, C)
    out = out.transpose(0, 2, 3, 4, 5, 1, 6).reshape(
        B, nr * chunk, o, o, nct * CT)
    return out[:, :P] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_crop_per_image(feat, Wy, Wx, chunk: int = 16,
                         interpret: bool = False):
    """out[b,p,i,x,c] = sum_{h,w} Wy[b,p,i,h]*Wx[b,p,x,w]*feat[b,h,w,c].

    feat: (B, Hl, Wl, C) with C % 128 == 0; Wy: (B, P, o, Hl);
    Wx: (B, P, o, Wl).  Returns (B, P, o, o, C) in feat.dtype.
    """
    return _forward(feat, Wy, Wx, chunk, interpret)


def _fwd(feat, Wy, Wx, chunk, interpret):
    return _forward(feat, Wy, Wx, chunk, interpret), (feat, Wy, Wx)


def _bwd(chunk, interpret, res, g):
    feat, Wy, Wx = res
    _, vjp = jax.vjp(_xla_crop, feat, Wy, Wx)
    return vjp(g)


fused_crop_per_image.defvjp(_fwd, _bwd)


def supports(feat, Wy, Wx) -> bool:
    """Static eligibility: C a multiple of the lane width and spatial
    extents the kernel's VMEM budget handles (flagship levels all do)."""
    B, Hl, Wl, C = feat.shape
    return (C % CT == 0 and Hl * Wl * CT * 2 <= 9 * 2 ** 20
            and Wy.shape[-1] == Hl and Wx.shape[-1] == Wl)


# --------------------------------------------------------------- windowed
# Level-routed locality kernel.  The dense crop above still contracts every
# RoI against the FULL level extent (Hl then Wl) — ~36x redundant FLOPs,
# because SingleRoIExtractor's area routing bounds almost every RoI's
# footprint on its own level to < 28 px per axis (sqrt(area)/stride in
# [14, 28) inside a level band).  Here each RoI DMAs one (SY, SX, C) patch
# from its own level (conditional copy from one of the level refs, window
# origin scalar-prefetched) and reduces it with two tiny GEMMs in VMEM:
#
#   t = W1[p] @ patch          (o, SY) @ (SY, SX*C)  -> cast to feat dtype
#   u = W2[p] @ t^T            (o, SX) @ (SX, o*C)
#
# HBM traffic: R * SY*SX*C * 2 B  (2.6 GB at the flagship's 4,000 RoIs,
# level-0 C=256) vs the dense path's ~470 GFLOP of MXU work — measured
# 14.4 -> ~3 ms.  Numerics match the dense path exactly (same weights,
# same f32-accumulate + dtype cast between stages); eligibility is checked
# by the caller, which falls back to the dense path under `lax.cond` when
# any RoI's span exceeds the window (degenerate aspect ratios).
#
# Mosaic alignment: HBM memref slices must have provably tile-aligned
# offsets in the second-to-minor dim (W here, tiling 8).  An arbitrary
# runtime x-origin cannot be proven divisible — BENCH_r04's "Failed to
# prove that a tile index in dimension 2 is divisible by the tiling (8)"
# was exactly this.  So the caller aligns the x-origin DOWN to a multiple
# of SX_ALIGN and passes the TILE index x0/8; the kernel multiplies by 8
# inside the slice expression, which Mosaic can prove divisible.  The x
# window is SX_ALIGN-1 px wider than the y window to absorb the
# align-down slack.  The y (second) dim of the memref is untiled, so the
# y-origin stays a free runtime value.

SY_WIN = 32           # y window extent; covers spans <= SY_WIN - 4
SX_ALIGN = 8          # Mosaic tiling of the second-to-minor memref dim
SX_WIN = 40           # x window extent; covers spans <= SX_WIN - 11
S_WIN = SY_WIN        # back-compat alias (tests, benches)


def _windowed_kernel(lvl_ref, y0_ref, x0t_ref, *refs, o, chunk, SY, SX, C,
                     n_levels, nr):
    """Double-buffered across grid steps: while step (b, r)'s chunk is
    reduced, step (b, r+1)'s per-RoI window DMAs are already in flight
    into the other scratch slot — without this the kernel is
    DMA-latency-bound (measured 6.4 ms vs its 3.2 ms bandwidth floor at
    the flagship's 4,000 RoIs; per-chunk issue/wait serialized with
    compute)."""
    levels = refs[:n_levels]
    w1_ref, w2_ref = refs[n_levels], refs[n_levels + 1]
    o_ref = refs[n_levels + 2]
    patches, sems = refs[n_levels + 3], refs[n_levels + 4]
    b = pl.program_id(0)
    r = pl.program_id(1)

    def issue(step_idx, slot):
        """Start the `chunk` window DMAs of flat step `step_idx` (=
        b*nr + r) into scratch slot `slot`."""
        bb = step_idx // nr
        rr = step_idx - bb * nr
        for j in range(chunk):
            yj = y0_ref[bb, rr * chunk + j]
            # x origin arrives as a TILE index; the explicit * SX_ALIGN in
            # the slice lets Mosaic prove 8-divisibility (see header note)
            xj = x0t_ref[bb, rr * chunk + j] * SX_ALIGN
            lj = lvl_ref[bb, rr * chunk + j]
            for l in range(n_levels):
                @pl.when(lj == l)
                def _(F=levels[l], bb=bb, yj=yj, xj=xj, j=j, slot=slot):
                    pltpu.make_async_copy(
                        F.at[bb, pl.ds(yj, SY), pl.ds(xj, SX), :],
                        patches.at[slot, j], sems.at[slot, j]).start()

    step = b * nr + r
    slot = step % 2

    @pl.when(step == 0)
    def _():
        issue(0, 0)

    @pl.when(step + 1 < pl.num_programs(0) * nr)
    def _():
        issue(step + 1, (step + 1) % 2)

    for j in range(chunk):
        # every level branch copies the same byte count; wait on slot j
        pltpu.make_async_copy(
            levels[0].at[0, pl.ds(0, SY), pl.ds(0, SX), :],
            patches.at[slot, j], sems.at[slot, j]).wait()
        patch = patches[slot, j].reshape(SY, SX * C)
        t = jax.lax.dot_general(
            w1_ref[0, j], patch, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (o, SX*C)
        t = t.astype(o_ref.dtype).reshape(o, SX, C).transpose(1, 0, 2)
        u = jax.lax.dot_general(
            w2_ref[0, j], t.reshape(SX, o * C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (o_x, o_i*C)
        u = u.reshape(o, o, C).transpose(1, 0, 2)        # (o_i, o_x, C)
        o_ref[0, j] = u.astype(o_ref.dtype)


def windowed_crop(levels, lvl, y0, x0, W1, W2, out_size: int,
                  chunk: int = 8, interpret: bool = False):
    """Crop every RoI from its own level's (SY_WIN, SX_WIN) window.

    levels: list of (B, Hl, Wl, C) maps, each pre-padded to Hl >= SY_WIN
    and Wl >= SX_WIN with Wl % SX_ALIGN == 0; lvl/y0/x0: (B, P) int32
    level id and window origin (y0 clipped to [0, Hl - SY_WIN]; x0
    clipped to [0, Wl - SX_WIN] AND a multiple of SX_ALIGN); W1: (B, P,
    o, SY_WIN) / W2: (B, P, o, SX_WIN) window-relative axis weights.
    Returns (B, P, o, o, C) in the levels' dtype.
    """
    B, P = lvl.shape
    o, SY = W1.shape[2], W1.shape[3]
    SX = W2.shape[3]
    C = levels[0].shape[-1]
    pad = (-P) % chunk
    if pad:
        zi = jnp.zeros((B, pad), jnp.int32)
        lvl = jnp.concatenate([lvl, zi], axis=1)
        y0 = jnp.concatenate([y0, zi], axis=1)
        x0 = jnp.concatenate([x0, zi], axis=1)
        W1 = jnp.concatenate(
            [W1, jnp.zeros((B, pad, o, SY), W1.dtype)], axis=1)
        W2 = jnp.concatenate(
            [W2, jnp.zeros((B, pad, o, SX), W2.dtype)], axis=1)
    Pp = P + pad
    nr = Pp // chunk
    n_levels = len(levels)
    x0t = x0 // SX_ALIGN    # tile index; kernel re-scales (alignment proof)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nr),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * n_levels +
            [pl.BlockSpec((1, chunk, o, SY), lambda b, r, *_: (b, r, 0, 0)),
             pl.BlockSpec((1, chunk, o, SX), lambda b, r, *_: (b, r, 0, 0))]),
        out_specs=pl.BlockSpec((1, chunk, o, o, C),
                               lambda b, r, *_: (b, r, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, SY, SX, C), levels[0].dtype),
            pltpu.SemaphoreType.DMA((2, chunk)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_windowed_kernel, o=o, chunk=chunk, SY=SY, SX=SX,
                          C=C, n_levels=n_levels, nr=nr),
        out_shape=jax.ShapeDtypeStruct((B, Pp, o, o, C), levels[0].dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lvl, y0, x0t, *levels, W1, W2)
    return out[:, :P] if pad else out
