#!/usr/bin/env python
"""Microbench: layernorm variants + stem convs at flagship shapes.

The backbone drill-down (tools/profile_backbone.py) shows a single
norm-style pass at stage-0 shape costing ~2.5 ms device time (roofline:
~0.15 ms) and the 3-conv stem ~8.7 ms (roofline: <2 ms).  This isolates
which formulation XLA lowers badly and what fixes it.

Run serialized with other TPU work (one chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

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


def main():
    B, H, W, C = 4, 128, 256, 96
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C)), jnp.bfloat16)
    g = jnp.asarray(rng.random((C,)), jnp.float32)
    b = jnp.asarray(rng.random((C,)), jnp.float32)

    # baseline: dispatch+sync overhead through the tunnel
    nop = jax.jit(lambda x: x + 1.0)
    base = timeit(nop, x)
    print(f"elementwise baseline: {base:.2f} ms")

    # 1. flax LayerNorm (f32 params, default promotion)
    ln_mod = nn.LayerNorm(epsilon=1e-5)
    v = ln_mod.init(jax.random.PRNGKey(0), x)
    ln_flax = jax.jit(lambda x: ln_mod.apply(v, x))
    print(f"flax LayerNorm:        {timeit(ln_flax, x):.2f} ms")

    # 2. hand layernorm, f32 compute, bf16 out
    def ln_hand(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)
    print(f"hand ln f32:           {timeit(jax.jit(ln_hand), x):.2f} ms")

    # 3. hand layernorm via E[x^2] (single-stat pass)
    def ln_mom(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        m2 = (xf * xf).mean(-1, keepdims=True)
        var = m2 - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)
    print(f"hand ln moments:       {timeit(jax.jit(ln_mom), x):.2f} ms")

    # 4. reshaped to 2-D rows (131072, 96)
    x2 = x.reshape(-1, C)
    def ln2d(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        m2 = (xf * xf).mean(-1, keepdims=True)
        var = m2 - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)
    print(f"hand ln 2-D rows:      {timeit(jax.jit(ln2d), x2):.2f} ms")

    # 5. C=128 control (lane-aligned)
    x128 = jnp.asarray(rng.random((B, H, W, 128)), jnp.bfloat16)
    g128 = jnp.ones((128,), jnp.float32)
    b128 = jnp.zeros((128,), jnp.float32)
    def ln128(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        m2 = (xf * xf).mean(-1, keepdims=True)
        var = m2 - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g128 + b128).astype(x.dtype)
    print(f"hand ln C=128:         {timeit(jax.jit(ln128), x128):.2f} ms")

    # 6. norm fused with a following matmul (ln + dense 96->288)
    wq = jnp.asarray(rng.random((C, 3 * C)), jnp.bfloat16)
    def ln_mm(x):
        y = ln_mom(x)
        return jnp.einsum("bhwc,cd->bhwd", y, wq)
    print(f"ln+qkv matmul:         {timeit(jax.jit(ln_mm), x):.2f} ms")
    mm = jax.jit(lambda x: jnp.einsum("bhwc,cd->bhwd", x, wq))
    print(f"qkv matmul alone:      {timeit(mm, x):.2f} ms")

    # --- stem pieces (B=4, 512x1024) ---
    img = jnp.asarray(rng.random((4, 512, 1024, 3)), jnp.bfloat16)
    k0 = jnp.asarray(rng.random((3, 3, 3, 32)), jnp.bfloat16)
    k1 = jnp.asarray(rng.random((3, 3, 32, 64)), jnp.bfloat16)
    kp = jnp.asarray(rng.random((4, 4, 64, 96)), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, k, stride=1, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    c0 = jax.jit(lambda im: conv(im, k0))
    print(f"stem conv0 3->32:      {timeit(c0, img):.2f} ms")
    h0 = c0(img)
    c1 = jax.jit(lambda h: conv(h, k1))
    print(f"stem conv1 32->64:     {timeit(c1, h0):.2f} ms")
    h1 = c1(h0)
    cp = jax.jit(lambda h: conv(h, kp, stride=4, pad="VALID"))
    print(f"stem proj 64->96 s4:   {timeit(cp, h1):.2f} ms")

    def stem_all(im):
        h = jax.nn.relu(conv(im, k0))
        h = jax.nn.relu(conv(h, k1))
        return conv(h, kp, stride=4, pad="VALID")
    print(f"stem fused chain:      {timeit(jax.jit(stem_all), img):.2f} ms")

    # conv1 with lane-aligned channels as control
    k1b = jnp.asarray(rng.random((3, 3, 128, 128)), jnp.bfloat16)
    h0b = jnp.asarray(rng.random((4, 512, 1024, 128)), jnp.bfloat16)
    c1b = jax.jit(lambda h: conv(h, k1b))
    print(f"conv 128->128 control: {timeit(c1b, h0b):.2f} ms")


if __name__ == "__main__":
    main()
