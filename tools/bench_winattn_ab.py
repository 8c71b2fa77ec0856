#!/usr/bin/env python
"""A/B window-attention formulations at flagship stage shapes.

bench_block_anatomy.py shows the WindowAttention module costs ~2.4-3.5 ms
at stage 0 while its GEMMs cost ~0.2 ms — the loss is in the explicit
(n,O,3,h,d)->(3,n,h,O,d) transpose copies and the f32 (n,h,O,O) HBM
round-trips.  Variants (identical math, f32 softmax):

  A. current: slice via 5-d transpose, nhqd einsums
  B. natural layout: keep (n,O,h,d), einsum nqhd,nkhd->nhqk (XLA fuses
     the layout change into the GEMMs; no explicit copies)
  C. packed Pallas kernel (wpack=4/8), including the transposes it needs
"""

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


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1000


STAGES = [  # (nW_per_img, heads, C) at B=4, ws=7 -> O=49
    (703, 3, 96),
    (185, 6, 192),
    (50, 12, 384),
    (15, 24, 768),
]


def main():
    from panoswintransformerobjectdetection_tpu.ops.fused_attention import (
        packed_window_attention)

    B, O = 4, 49
    rng = np.random.default_rng(0)
    nopx = jnp.zeros((128, 128), jnp.bfloat16)
    nop = jax.jit(lambda x: x + 1.0)
    base = timeit(nop, nopx)
    print(f"dispatch baseline: {base:.2f} ms")

    for nW, h, C in STAGES:
        n = B * nW
        d = C // h
        scale = d ** -0.5
        qkv = jnp.asarray(rng.random((n, O, 3 * C)), jnp.bfloat16)
        bias = jnp.asarray(rng.random((nW, h, O, O)), jnp.float32)

        def var_a(qkv):
            t = qkv.reshape(n, O, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = t[0], t[1], t[2]
            s = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                           preferred_element_type=jnp.float32)
            s = (s.reshape(B, nW, h, O, O) + bias[None]).reshape(n, h, O, O)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nhkd->nhqd", p.astype(v.dtype), v)
            return o.transpose(0, 2, 1, 3).reshape(n, O, C)

        def var_b(qkv):
            t = qkv.reshape(n, O, 3, h, d)
            q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]   # (n, O, h, d)
            s = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                           preferred_element_type=jnp.float32)
            s = (s.reshape(B, nW, h, O, O) + bias[None]).reshape(n, h, O, O)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p.astype(v.dtype), v)
            return o.reshape(n, O, C)

        def var_c(qkv, wpack):
            t = qkv.reshape(n, O, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = t[0], t[1], t[2]
            Op = 56
            padq = ((0, 0), (0, 0), (0, Op - O), (0, 0))
            qp = jnp.pad(q, padq)
            kp = jnp.pad(k, padq)
            vp = jnp.pad(v, padq)
            bp = jnp.pad(bias, ((0, 0), (0, 0), (0, Op - O), (0, Op - O)))
            bp = bp.at[..., :, O:].set(-1e9)
            out = packed_window_attention(qp, kp, vp, bp, scale, wpack)
            return out[:, :, :O].transpose(0, 2, 1, 3).reshape(n, O, C)

        fa = jax.jit(var_a)
        fb = jax.jit(var_b)
        ta = timeit(fa, qkv) - base
        tb = timeit(fb, qkv) - base
        ra = fa(qkv)
        err_b = float(jnp.max(jnp.abs(
            (ra - fb(qkv)).astype(jnp.float32))))
        line = (f"s(nW={nW:4d},h={h:2d},C={C:3d}): "
                f"A {ta:5.2f} | B {tb:5.2f} (d={err_b:.1e})")
        for wp in (4, 8):
            fc = jax.jit(lambda q, wp=wp: var_c(q, wp))
            tc = timeit(fc, qkv) - base
            err_c = float(jnp.max(jnp.abs(
                (ra - fc(qkv)).astype(jnp.float32))))
            line += f" | C{wp} {tc:5.2f} (d={err_c:.1e})"
        print(line)


if __name__ == "__main__":
    main()
