#!/usr/bin/env python
"""A/B the full window-attention path from the (B, Hp, Wp, C) feature map:

  baseline:     window_partition -> attention core -> window_reverse
                (explicit 6-d transposes around the GEMMs)
  partition-free: qkv GEMM on the map, then one dot_general per attention
                stage with batch dims (B, nH, nW, h) and free dims (ws, ws)
                — the window gathering rides INSIDE the GEMM operand
                layouts; every reshape is a contiguous split/merge (free).

Run at each flagship stage geometry.  Numerics must match exactly (same
ops, different schedule)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def hard_sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def marginal(fn, x, extra, k1=1, k2=4):
    """Chained reps (output feeds the next input): serial latency, not
    overlappable throughput — matches tools/bench_backbone_stages.py."""
    def rep(k):
        @jax.jit
        def f(a, *e):
            for _ in range(k):
                a = fn(a, *e).astype(a.dtype)
            return a
        return f
    t1 = timeit(rep(k1), x, *extra)
    t2 = timeit(rep(k2), x, *extra)
    return (t2 - t1) / (k2 - k1)


def run_geometry(B, H, W, c, h, ws):
    from panoswintransformerobjectdetection_tpu.models.panoswin import sphere_bias
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, window_reverse, make_relative_position_index)
    from panoswintransformerobjectdetection_tpu.geometry.sphere import make_uv_grid

    O = ws * ws
    d = c // h
    scale = d ** -0.5
    rng = np.random.default_rng(0)

    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nH, nW = Hp // ws, Wp // ws
    nWin = nH * nW
    n = B * nWin
    xmap = jnp.asarray(rng.standard_normal((B, Hp, Wp, c)), jnp.bfloat16)
    uv = make_uv_grid(H, W)
    uvp = jnp.pad(uv, ((0, Hp - H), (0, Wp - W), (0, 0)))
    uvw = window_partition(uvp[None], ws).reshape(nWin, O, 2)
    ri = make_relative_position_index(ws)
    T = (2 * ws - 1) ** 2
    Wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.bfloat16)
    Wpr = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
    alpha = jnp.asarray(rng.standard_normal((T, h)) * 0.02, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((T, h)) * 0.02, jnp.float32)
    extra = (Wqkv, bqkv, Wpr, alpha, beta)

    def baseline(xm, Wqkv, bqkv, Wproj, alpha, beta):
        wins = window_partition(xm, ws).reshape(n, O, c)
        qkv = (wins @ Wqkv + bqkv).reshape(n, O, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nWin, h, O, O) + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        out = (out.transpose(0, 2, 1, 3).reshape(n, O, c)) @ Wproj
        return window_reverse(out.reshape(-1, ws, ws, c), ws, Hp, Wp)

    def partition_free(xm, Wqkv, bqkv, Wproj, alpha, beta):
        qkv = (xm @ Wqkv + bqkv)                        # (B, Hp, Wp, 3c)
        qkv = qkv.reshape(B, nH, ws, nW, ws, 3, h, d)   # free splits
        q = qkv[:, :, :, :, :, 0]
        k = qkv[:, :, :, :, :, 1]
        v = qkv[:, :, :, :, :, 2]                        # (B,nH,ws,nW,ws,h,d)
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)   # (nWin,h,O,O)
        attn = jnp.einsum("bipjqhd,biPjQhd->bijhpqPQ", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nH, nW, h, O, O) \
            + bias.reshape(nH, nW, h, O, O)[None].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(B, nH, nW, h, ws, ws, ws, ws)
        out = jnp.einsum("bijhpqPQ,biPjQhd->bipjqhd", attn.astype(v.dtype), v)
        out = out.reshape(B, Hp, Wp, c)
        return out @ Wproj

    o1 = jax.jit(baseline)(xmap, *extra)
    o2 = jax.jit(partition_free)(xmap, *extra)
    err = float(np.max(np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32))))
    t1 = marginal(baseline, xmap, extra)
    t2 = marginal(partition_free, xmap, extra)
    print(f"B{B} {H}x{W}x{c} h{h}: baseline {t1:.2f} ms | partition-free {t2:.2f} ms"
          f" | max|diff| {err:.2e}", flush=True)


def main():
    for (H, W, c, h) in ((128, 256, 96, 3), (64, 128, 192, 6),
                         (32, 64, 384, 12), (16, 32, 768, 24)):
        run_geometry(4, H, W, c, h, 7)


if __name__ == "__main__":
    main()
