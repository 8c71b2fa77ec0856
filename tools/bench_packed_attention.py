#!/usr/bin/env python
"""Kernel-level A/B: packed Pallas window attention vs the XLA batched-GEMM
path at flagship stage geometries, marginal-cost timing, wpack sweep."""

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


def marginal(fn, args, k1=1, k2=5):
    def rep(k):
        def f(*a):
            acc = 0.0
            q = a[0]
            for i in range(k):
                acc = acc + fn(q * (1.0 + 1e-4 * i), *a[1:]).sum()
            return acc
        return jax.jit(f)
    t1 = timeit(rep(k1), *args)
    t2 = timeit(rep(k2), *args)
    return (t2 - t1) / (k2 - k1)


def main():
    from panoswintransformerobjectdetection_tpu.ops.fused_attention import (
        _packed_forward, _xla_reference)

    B = 4
    # (label, nW, h, O, d) per flagship stage (512x1024, ws=7, O padded 56)
    stages = [
        ("s0", 703, 3, 56, 32),
        ("s1", 185, 6, 56, 32),
        ("s2", 50, 12, 56, 32),
        ("s3", 15, 24, 56, 32),
    ]
    rng = np.random.default_rng(0)
    for label, nW, h, O, d in stages:
        n = B * nW
        q = jnp.asarray(rng.standard_normal((n, h, O, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((n, h, O, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((n, h, O, d)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((nW, h, O, O)), jnp.float32)
        scale = d ** -0.5
        t = marginal(lambda q, k, v, b: _xla_reference(q, k, v, b, scale),
                     (q, k, v, bias))
        print(f"{label} nW={nW} h={h}: xla {t:.2f} ms", flush=True)
        for wpack in (2, 4, 8):
            t = marginal(
                lambda q, k, v, b, wp=wpack: _packed_forward(
                    q, k, v, b, scale, wp), (q, k, v, bias))
            print(f"{label} nW={nW} h={h}: packed wpack={wpack} {t:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
