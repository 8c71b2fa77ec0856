"""Pallas fused window attention: qk^T + sphere bias + softmax + @v in VMEM.

The XLA path materializes the (B*nW, heads, O, O) attention tensor in HBM
between the two batched matmuls; this kernel keeps it in VMEM.  Each grid
program processes one (batch-window block, head) slice:

  grid = (B*nW / WBLK, heads)
  q, k, v blocks: (WBLK, O, d) VMEM;  bias block: (nW-tiled WBLK, O, O)

O (=window_size^2, 49 for ws=7) is padded to a multiple of 8 by the
caller; the pad rows carry -inf bias columns so softmax ignores them.

Used by `models.panoswin.WindowAttention` when `fused=True` (pano mode,
no planar mask).  Falls back to XLA otherwise.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, wblk):
    def body(g, _):
        q = q_ref[0, g]                                # (O, d)
        k = k_ref[0, g]
        v = v_ref[0, g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, g]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, wblk, body, 0)


def fused_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray, scale: float,
                           wblk: int = 16, interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (n, h, O, d) with n = B*nW; bias: (nW, h, O, O) f32
    (batch-independent).  Returns (n, h, O, d) in q.dtype.

    O and d should be multiples of 8 (pad windows before calling; padded
    key columns must carry a large negative bias).
    """
    n, h, O, d = q.shape
    nW = bias.shape[0]
    B = n // nW
    assert n % nW == 0

    # layout: (h, n, O, d) so the grid's window axis is contiguous per head
    qt = q.transpose(1, 0, 2, 3)
    kt = k.transpose(1, 0, 2, 3)
    vt = v.transpose(1, 0, 2, 3)
    bt = jnp.broadcast_to(bias.transpose(1, 0, 2, 3)[:, None],
                          (h, B, nW, O, O)).reshape(h, n, O, O)

    while n % wblk:
        wblk //= 2
    grid = (h, n // wblk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, wblk=wblk),
        out_shape=jax.ShapeDtypeStruct((h, n, O, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wblk, O, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, wblk, O, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, wblk, O, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, wblk, O, O), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, wblk, O, d), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )(qt, kt, vt, bt)
    return out.transpose(1, 0, 2, 3)


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                   heads, wpack, O):
    """One grid step: wpack windows x all heads, S kept in VMEM.

    q/k/v blocks: (1, wpack, h, O, d); bias block: (wpack, h, O, O).
    The wpack windows are flattened into one (wpack*O, wpack*O) GEMM pair
    per head — MXU-sized instead of (O, O) — with the off-diagonal
    (cross-window) region masked to -inf before the softmax.
    """
    M = wpack * O
    rw = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // O
    cw = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // O
    same = rw == cw
    for hh in range(heads):
        q = q_ref[0, :, hh].reshape(M, -1)
        k = k_ref[0, :, hh].reshape(M, -1)
        v = v_ref[0, :, hh].reshape(M, -1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # block-diagonal bias from static slices + concats (Mosaic has no
        # dynamic_update_slice); off-diagonal is masked below anyway
        rows = []
        for w in range(wpack):
            blk = bias_ref[w, hh].astype(jnp.float32)
            parts = []
            if w:
                parts.append(jnp.zeros((O, w * O), jnp.float32))
            parts.append(blk)
            if w + 1 < wpack:
                parts.append(jnp.zeros((O, M - (w + 1) * O), jnp.float32))
            rows.append(parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=1))
        bias_full = jnp.concatenate(rows, axis=0) if wpack > 1 else rows[0]
        s = jnp.where(same, s + bias_full, -1e9)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, hh] = o.reshape(wpack, O, -1).astype(o_ref.dtype)


def _packed_forward(q, k, v, bias, scale, wpack, interpret=None):
    if interpret is None:
        # Mosaic kernels only exist on TPU; CPU (tests, dryrun) interprets
        interpret = jax.devices()[0].platform != "tpu"
    n, h, O, d = q.shape
    nW = bias.shape[0]
    B = n // nW
    assert n % nW == 0, (n, nW)
    nW_pad = -(-nW // wpack) * wpack
    qb = q.reshape(B, nW, h, O, d)
    kb = k.reshape(B, nW, h, O, d)
    vb = v.reshape(B, nW, h, O, d)
    if nW_pad != nW:
        padw = ((0, 0), (0, nW_pad - nW), (0, 0), (0, 0), (0, 0))
        qb = jnp.pad(qb, padw)
        kb = jnp.pad(kb, padw)
        vb = jnp.pad(vb, padw)
        bias = jnp.pad(bias, ((0, nW_pad - nW), (0, 0), (0, 0), (0, 0)))
    nblk = nW_pad // wpack

    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, heads=h,
                          wpack=wpack, O=O),
        out_shape=jax.ShapeDtypeStruct((B, nW_pad, h, O, d), q.dtype),
        # window-block-major grid: the bias block depends only on i, so
        # consecutive b steps reuse it without a fresh DMA
        grid=(nblk, B),
        in_specs=[
            pl.BlockSpec((1, wpack, h, O, d), lambda i, b: (b, i, 0, 0, 0)),
            pl.BlockSpec((1, wpack, h, O, d), lambda i, b: (b, i, 0, 0, 0)),
            pl.BlockSpec((1, wpack, h, O, d), lambda i, b: (b, i, 0, 0, 0)),
            pl.BlockSpec((wpack, h, O, O), lambda i, b: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, wpack, h, O, d),
                               lambda i, b: (b, i, 0, 0, 0)),
        interpret=interpret,
    )(qb, kb, vb, bias)
    return out[:, :nW].reshape(n, h, O, d)


def _xla_reference(q, k, v, bias, scale):
    """Pure-XLA reference used for the packed kernel's backward pass
    (recompute-based custom VJP) and for parity tests."""
    n, h, O, d = q.shape
    nW = bias.shape[0]
    attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(n // nW, nW, h, O, O) + bias[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
    return jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def packed_window_attention(q, k, v, bias, scale: float, wpack: int = 8):
    """Block-packed fused window attention.

    q/k/v: (n, h, O, d), n = B*nW; bias: (nW, h, O, O) — the full additive
    bias (sphere/relative bias plus any shifted-window mask already folded
    in).  O must be a multiple of 8 with padded key columns carrying a
    large negative bias (pad_windows_for_fused).

    Packs `wpack` windows into a single (wpack*O, wpack*O) GEMM pair per
    head with block-diagonal masking: the XLA path's (49, 49) batched
    GEMMs are far below MXU tile size and run overhead-bound, while the
    packed GEMM trades wpack-fold redundant FLOPs (masked off-diagonal)
    for full MXU utilization, and S never leaves VMEM.
    """
    return _packed_forward(q, k, v, bias, scale, wpack)


def _packed_fwd(q, k, v, bias, scale, wpack):
    return _packed_forward(q, k, v, bias, scale, wpack), (q, k, v, bias)


def _packed_bwd(scale, wpack, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _xla_reference(q_, k_, v_, b_, scale),
                     q, k, v, bias)
    return vjp(g)


packed_window_attention.defvjp(_packed_fwd, _packed_bwd)


def pad_windows_for_fused(x_windows, uv_windows, O_pad):
    """Pad the token axis of (n, O, c) windows to O_pad; padded uv is set
    far from everything so haversine bias won't make padded keys win, and
    the caller additionally masks padded columns with -inf bias."""
    n, O, c = x_windows.shape
    if O == O_pad:
        return x_windows, uv_windows
    x = jnp.pad(x_windows, ((0, 0), (0, O_pad - O), (0, 0)))
    uv = jnp.pad(uv_windows, ((0, 0), (0, O_pad - O), (0, 0)))
    return x, uv
