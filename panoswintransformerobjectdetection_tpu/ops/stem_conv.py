"""Fused Pallas stem kernel: conv3x3(3->c/3) + BN + ReLU + conv3x3(c/3->2c/3)
+ BN + ReLU, with the final 4x4/4 patch projection left to XLA.

XLA lowers the PanoSwin 3-conv patch stem (`ConvStemPatchEmbed`,
reference `simple_panoswin_transformer.py:727-773`) to three separate
spatial convolutions at full input resolution; at (4, 512, 1024, 3) the
two 3x3 convs measure ~7 ms device time on v5e (tools/bench_conv_variants.py:
lax.conv 32->64 3x3 alone is ~7 ms for 77 GFLOP, ~5% MXU — small-channel
lane padding plus full-res intermediates round-tripping HBM).

Layout: channels-major, pixels-on-lanes.  The image rides flat as
(B, 4, (H+4)*Wp) zero-padded planes (3 channels + 1 zero; DMA slices
must be 128-lane- and 4-sublane-aligned).  Each program DMAs one
(4, (TR+4)*Wp) row-strip slab and computes both convs as single MXU
GEMMs over im2col matrices assembled from the slab:

  - the row-shift component of a 3x3 tap is dy*Wp in flat pixel space —
    a multiple of 128, i.e. an ALIGNED lane slice, free of data movement;
  - only the dx = +-1 column shifts need real rolls (2 per conv input);
  - the 27 (conv0) / 288 (conv1) im2col rows are stacked with sublane
    concatenation (verified to lower, tools/probe_mosaic_ops.py — unlike
    minor-dim concat or sublane<->lane reshapes, which do not);
  - conv0: (c0, 32) @ (32, M0) and conv1: (c1, 9*c0) @ (9*c0, M1) — the
    K dims are 32/288 instead of the 3/32 a pixels-major formulation
    gets, and the N dim is the full pixel strip, so the MXU actually
    tiles instead of idling on lane padding.

h0 never touches HBM.  conv1 zero-pads its input at the image border but
h0's halo holds relu(conv0(zero-pad)) != 0 there — masked before use.
Roll wrap-around always lands in the >=2-column zero pad margins.

The kernel emits h1 channels-major flat (B, c1, H*Wp); XLA reshapes,
crops the pad columns, and runs the 4x4/4 projection as an NCHW conv
(the stride-4 column selection has no Mosaic-supported formulation —
strided slices and sublane-group->lane reshapes both fail to lower).

BN running stats are folded into per-channel scale/shift by the caller
(fold_bn), so the kernel serves the inference path; training keeps the
XLA convs (batch-stat updates need the global batch anyway).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Stem BatchNorm epsilon — the single source shared by the nn.BatchNorm
# construction in models/layers.py and every BN fold (fold_bn default,
# ConvStemPatchEmbed._fused_stem).
BN_EPS = 1e-5

TR = 16          # h1 rows emitted per program
# column zero-pad: 2-px halo left; right pad rounds the row width up to
# a multiple of 128 (flat lane offsets/extents must be 128-aligned)
PAD_L, PAD_R = 2, 126


def _stem2cm_kernel(x_hbm, w0_ref, b0_ref, w1_ref, b1_ref, o_ref,
                    x_tile, sem, *, c0, c1, H, Wp):
    b = pl.program_id(0)
    i = pl.program_id(1)
    NS = (TR + 4) * Wp
    M0 = (TR + 2) * Wp   # h0 strip: slab rows 1 .. TR+2
    M1 = TR * Wp         # h1 strip: slab rows 2 .. TR+1

    # row strips overlap by the 4-row halo, which BlockSpec index maps
    # (block-quantized) cannot express — DMA the slab manually.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * TR * Wp, NS)], x_tile, sem)
    cp.start()
    cp.wait()

    x = x_tile[...]                                      # (4, NS)
    xl = jnp.roll(x, 1, axis=1)                          # x[p-1]
    xr = jnp.roll(x, -1, axis=1)                         # x[p+1]
    planes = (xl, x, xr)                                 # by dx

    # conv0 im2col: row t = (dy*3+dx)*3+ci is the tap x_ci[p0 + (dy-1)*Wp
    # + (dx-1)] for h0 pixel p0 starting at slab row 1 -> lane offset
    # dy*Wp into the dx-rolled plane.  27 taps + 5 zero rows = K 32.
    taps0 = []
    for dy in range(3):
        lo = dy * Wp
        for dx in range(3):
            src = planes[dx]
            for ci in range(3):
                taps0.append(src[ci:ci + 1, lo:lo + M0])
    taps0.append(jnp.zeros((5, M0), x.dtype))
    p0 = jnp.concatenate(taps0, axis=0)                  # (32, M0)
    h0 = jax.lax.dot_general(
        w0_ref[...], p0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (c0, M0)
    h0 = jnp.maximum(h0 + b0_ref[...], 0.0)

    # conv1 zero-pads at the image border; h0's halo outside
    # [0,H) x [0,W) holds relu(conv0(zero-pad)) != 0 — mask it (this
    # also zeroes the pad columns that absorb roll wrap-around).
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, M0), 1)
    grow = i * TR + pix // Wp - 1                        # global image row
    gcol = pix % Wp
    inside = ((grow >= 0) & (grow < H) &
              (gcol >= PAD_L) & (gcol < Wp - PAD_R))
    h0 = jnp.where(inside, h0, 0.0).astype(x.dtype)

    h0l = jnp.roll(h0, 1, axis=1)
    h0r = jnp.roll(h0, -1, axis=1)
    h0planes = (h0l, h0, h0r)

    # conv1 im2col: block row 32*(dy*3+dx) .. +c0 is the tap
    # h0[p1 + (dy-1)*Wp + (dx-1)] — h1 starts one slab row into h0's
    # strip, so the aligned lane offset is again dy*Wp.
    taps1 = []
    for dy in range(3):
        lo = dy * Wp
        for dx in range(3):
            taps1.append(h0planes[dx][:, lo:lo + M1])
    p1 = jnp.concatenate(taps1, axis=0)                  # (9*c0, M1)
    h1 = jax.lax.dot_general(
        w1_ref[...], p1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (c1, M1)
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
    o_ref[0] = h1.astype(o_ref.dtype)


def _stem2(x, w0, b0, w1, b1, *, interpret):
    """conv3x3+relu twice, fused, channels-major.

    x (B, H, W, 3) -> (B, c1, H, Wp) NCHW with the pad columns still in
    (caller crops [:, :, :, PAD_L:PAD_L+W]).
    """
    B, H, W, Cin = x.shape
    assert Cin == 3, Cin
    c0 = w0.shape[-1]
    c1 = w1.shape[-1]
    assert H % TR == 0, (H, TR)
    Wp = W + PAD_L + PAD_R
    assert Wp % 128 == 0, Wp

    dt = x.dtype
    xp = jnp.pad(x, ((0, 0), (2, 2), (PAD_L, PAD_R), (0, 1)))
    xp = xp.transpose(0, 3, 1, 2).reshape(B, 4, (H + 4) * Wp)
    w0m = jnp.pad(w0.reshape(27, c0), ((0, 5), (0, 0))).T.astype(dt)
    w1m = w1.reshape(9 * c0, c1).T.astype(dt)
    b0r = b0.reshape(c0, 1).astype(jnp.float32)
    b1r = b1.reshape(c1, 1).astype(jnp.float32)

    grid = (B, H // TR)
    out = pl.pallas_call(
        functools.partial(_stem2cm_kernel, c0=c0, c1=c1, H=H, Wp=Wp),
        out_shape=jax.ShapeDtypeStruct((B, c1, H * Wp), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x, manual DMA
            pl.BlockSpec((c0, 32), lambda b, i: (0, 0)),
            pl.BlockSpec((c0, 1), lambda b, i: (0, 0)),
            pl.BlockSpec((c1, 9 * c0), lambda b, i: (0, 0)),
            pl.BlockSpec((c1, 1), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c1, TR * Wp), lambda b, i: (b, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((4, (TR + 4) * Wp), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w0m, b0r, w1m, b1r)
    return out.reshape(B, c1, H, Wp)


@functools.lru_cache(maxsize=1)
def _warn_interpret_once():
    # Force-enabling the fused stem (env/global flag) on a non-TPU backend
    # drops into Pallas interpret mode — orders of magnitude slower than
    # the XLA convs.  Tests that want interpret mode pass interpret=True
    # explicitly and do not hit this.
    import warnings
    warnings.warn(
        "stem_conv_fused called on a non-TPU backend; running the Pallas "
        "kernel in interpret mode, which is far slower than the XLA conv "
        "chain. Unset PANOSWIN_FUSED_STEM / models.layers.USE_FUSED_STEM "
        "unless this is a numerics test.", RuntimeWarning, stacklevel=3)


def stem_conv_fused(x, w0, b0, w1, b1, wp, bp, *, interpret=None):
    """Fused stem forward (inference path, BN pre-folded).

    x: (B, H, W, 3) with H % 16 == 0, W % 128 == 0; w0: (3, 3, 3, c0);
    w1: (3, 3, c0, c1); wp: (4, 4, c1, ce) — raw conv kernels (BN already
    folded into w/b by the caller); b0/b1/bp: per-channel shifts.
    Returns (B, H/4, W/4, ce) in x.dtype.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
        if interpret:
            _warn_interpret_once()
    h1 = _stem2(x, w0, b0, w1, b1, interpret=interpret)
    h1 = h1[:, :, :, PAD_L:PAD_L + x.shape[2]]
    dn = jax.lax.conv_dimension_numbers(
        h1.shape, wp.shape, ("NCHW", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        h1, wp.astype(h1.dtype), (4, 4), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return (out + bp).astype(x.dtype)


def fold_bn(kernel, gamma, beta, mean, var, eps=BN_EPS):
    """Fold BatchNorm running stats into a conv kernel + bias.

    kernel: (kh, kw, cin, cout); returns (kernel', bias') with
    conv(x, k') + b' == BN(conv(x, k)).
    """
    scale = gamma / np.sqrt(var + eps)
    return kernel * scale, beta - mean * scale
