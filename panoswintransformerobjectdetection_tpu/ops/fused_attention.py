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
