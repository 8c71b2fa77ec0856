#!/usr/bin/env python
"""Device roofline calibration: peak bf16 matmul TFLOP/s + HBM GB/s.

All perf judgments (stem conv efficiency, backbone headroom) need the
real ceiling of the attached chip, not datasheet numbers.
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


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)

    nop = jax.jit(lambda x: x[:8, :8] + 1.0)
    cal = jnp.asarray(rng.random((128, 128)), jnp.bfloat16)
    base = timeit(nop, cal, iters=20)
    print(f"dispatch baseline: {base:.2f} ms")

    for n in (4096, 8192):
        a = jnp.asarray(rng.random((n, n)), jnp.bfloat16)
        b = jnp.asarray(rng.random((n, n)), jnp.bfloat16)
        mm = jax.jit(lambda a, b: a @ b)
        t = timeit(mm, a, b) - base
        fl = 2 * n ** 3 / 1e12
        print(f"matmul {n}x{n}: {t:.2f} ms -> {fl / (t / 1e3):.1f} TFLOP/s")

    # chained matmuls to amortize dispatch: x @ b, 8 times
    a = jnp.asarray(rng.random((8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng.random((8192, 8192)), jnp.bfloat16)
    def chain(a, b):
        x = a
        for _ in range(8):
            x = x @ b
        return x
    t = timeit(jax.jit(chain), a, b) - base
    fl = 8 * 2 * 8192 ** 3 / 1e12
    print(f"matmul chain x8: {t:.2f} ms -> {fl / (t / 1e3):.1f} TFLOP/s")

    # HBM bandwidth: big copy-transform (read+write 512 MB each way)
    big = jnp.asarray(rng.random((256, 1024, 1024)), jnp.bfloat16)  # 512 MB
    cp = jax.jit(lambda x: x * 1.0009 + 0.5)
    t = timeit(cp, big) - base
    gb = 2 * big.size * 2 / 1e9
    print(f"elementwise 512MB: {t:.2f} ms -> {gb / (t / 1e3):.0f} GB/s")

    # reduction (read-only bound)
    red = jax.jit(lambda x: x.astype(jnp.float32).sum())
    t = timeit(red, big) - base
    gb = big.size * 2 / 1e9
    print(f"reduce 512MB: {t:.2f} ms -> {gb / (t / 1e3):.0f} GB/s read")


if __name__ == "__main__":
    main()
