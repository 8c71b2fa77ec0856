#!/usr/bin/env python
"""A/B layout variants of the WindowAttention module at flagship stage-0
geometry.  The GEMM+softmax core is ~0.1 ms; the module costs ~3.5 ms —
this isolates where the rest goes (qkv transposes, bias build, proj)."""

import os
import sys
import time
import functools

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
    def rep(k):
        @jax.jit
        def f(a, *e):
            acc = 0.0
            for i in range(k):
                acc = acc + fn(a * (1.0 + 1e-4 * i), *e).sum()
            return acc
        return f
    t1 = timeit(rep(k1), x, *extra)
    t2 = timeit(rep(k2), x, *extra)
    return (t2 - t1) / (k2 - k1)


def main():
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        sphere_bias)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        make_relative_position_index)
    from panoswintransformerobjectdetection_tpu.geometry.sphere import (
        make_uv_grid, haversine)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, table_lookup)

    B, H, W, c, h, ws = 4, 128, 256, 96, 3, 7
    O = ws * ws
    d = c // h
    scale = d ** -0.5
    rng = np.random.default_rng(0)

    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nW = (Hp // ws) * (Wp // ws)
    n = B * nW
    wins = jnp.asarray(rng.standard_normal((n, O, c)), jnp.bfloat16)
    uv = make_uv_grid(H, W)
    uvp = jnp.pad(uv, ((0, Hp - H), (0, Wp - W), (0, 0)))
    uvw = window_partition(uvp[None], ws).reshape(nW, O, 2)
    ri = make_relative_position_index(ws)
    T = (2 * ws - 1) ** 2
    Wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * c,), jnp.bfloat16)
    Wp_ = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
    alpha = jnp.asarray(rng.standard_normal((T, h)) * 0.02, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((T, h)) * 0.02, jnp.float32)
    extra = (Wqkv, bqkv, Wp_, alpha, beta)

    def variant_current(x, Wqkv, bqkv, Wproj, alpha, beta):
        qkv = (x @ Wqkv + bqkv).reshape(n, O, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)  # (nW, h, O, O)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nW, h, O, O) + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        return (out.transpose(0, 2, 1, 3).reshape(n, O, c)) @ Wproj

    def variant_einsum(x, Wqkv, bqkv, Wproj, alpha, beta):
        # no explicit 5-d transpose: dot_general takes (n, O, h, d) directly
        qkv = (x @ Wqkv + bqkv).reshape(n, O, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nW, h, O, O) + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(v.dtype), v)
        return out.reshape(n, O, c) @ Wproj

    def variant_split_qkv(x, Wqkv, bqkv, Wproj, alpha, beta):
        # three separate GEMMs straight into (n, O, h, d) — no 3-slot axis
        Wq, Wk, Wv = Wqkv[:, :c], Wqkv[:, c:2 * c], Wqkv[:, 2 * c:]
        bq, bk, bv = bqkv[:c], bqkv[c:2 * c], bqkv[2 * c:]
        q = (x @ Wq + bq).reshape(n, O, h, d)
        k = (x @ Wk + bk).reshape(n, O, h, d)
        v = (x @ Wv + bv).reshape(n, O, h, d)
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nW, h, O, O) + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(v.dtype), v)
        return out.reshape(n, O, c) @ Wproj

    def variant_bf16_bias(x, Wqkv, bqkv, Wproj, alpha, beta):
        # bias pre-cast to bf16, softmax still f32 via the einsum output
        qkv = (x @ Wqkv + bqkv).reshape(n, O, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        bias = sphere_bias(alpha, beta, ri, uvw, uvw, True)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, nW, h, O, O) + bias[None]
        attn = jax.nn.softmax(attn.reshape(n, h, O, O), axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(v.dtype), v)
        return out.reshape(n, O, c) @ Wproj

    ref = None
    for name, fn in (("current", variant_current),
                     ("einsum-direct", variant_einsum),
                     ("split-qkv", variant_split_qkv),
                     ("einsum+f32add", variant_bf16_bias)):
        out = jax.jit(fn)(wins, *extra)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            print(f"  [{name}] max|diff vs current| = {err:.2e}", flush=True)
        t = marginal(fn, wins, extra)
        print(f"{name}: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
