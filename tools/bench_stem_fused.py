#!/usr/bin/env python
"""A/B: fused Pallas stem vs XLA conv chain at flagship shape (4,512,1024,3)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from panoswintransformerobjectdetection_tpu.ops.stem_conv import stem_conv_fused

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

def hard_sync(t):
    leaf = jax.tree_util.tree_leaves(t)[0]
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
    rng = np.random.default_rng(0)
    B, H, W = 4, 512, 1024
    c0, c1, ce = 32, 64, 96
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5, dt)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 3, c0)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c0, c1)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((4, 4, c1, ce)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((c0,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)), jnp.float32)
    bp = jnp.asarray(rng.standard_normal((ce,)), jnp.float32)

    dn = jax.lax.conv_dimension_numbers((1,1,1,1),(1,1,1,1),("NHWC","HWIO","NHWC"))
    def conv(h, k, s, p):
        return jax.lax.conv_general_dilated(h, k.astype(h.dtype), (s,s), p,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
    def xla_stem(x):
        h = jnp.maximum(conv(x, w0, 1, "SAME") + b0, 0.0).astype(x.dtype)
        h = jnp.maximum(conv(h, w1, 1, "SAME") + b1, 0.0).astype(x.dtype)
        return (conv(h, wp, 4, "VALID") + bp).astype(x.dtype)
    fused = jax.jit(lambda x: stem_conv_fused(x, w0, b0, w1, b1, wp, bp))
    ref = jax.jit(xla_stem)

    a = np.asarray(ref(x), np.float32); b = np.asarray(fused(x), np.float32)
    print(f"max|diff| = {np.abs(a - b).max():.4f}  (mean|ref| {np.abs(a).mean():.3f})")
    print(f"xla stem chain : {timeit(ref, x):.2f} ms")
    print(f"pallas fused   : {timeit(fused, x):.2f} ms")

if __name__ == "__main__":
    main()

def decompose():
    import panoswintransformerobjectdetection_tpu.ops.stem_conv as sc
    rng = np.random.default_rng(0)
    B, H, W = 4, 512, 1024
    c0, c1, ce = 32, 64, 96
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5, dt)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 3, c0)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c0, c1)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((4, 4, c1, ce)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((c0,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)), jnp.float32)
    bp = jnp.asarray(rng.standard_normal((ce,)), jnp.float32)

    nop = jax.jit(lambda x: x + 1.0)
    print(f"dispatch baseline: {timeit(nop, x):.2f} ms")
    f_kern = jax.jit(lambda x: sc._stem2(x, w0, b0, w1, b1, interpret=False))
    print(f"kernel(+pad/transpose), NCHW out: {timeit(f_kern, x):.2f} ms")
    h1 = f_kern(x)
    def post(h1):
        h1c = h1[:, :, :, sc.PAD_L:sc.PAD_L + W]
        dn = jax.lax.conv_dimension_numbers(h1c.shape, wp.shape, ("NCHW", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(h1c, wp.astype(h1.dtype), (4, 4), "VALID",
                                           dimension_numbers=dn,
                                           preferred_element_type=jnp.float32)
        return (out + bp).astype(h1.dtype)
    print(f"crop+proj NCHW: {timeit(jax.jit(post), h1):.2f} ms")
    # pad/transpose alone
    def pre(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (sc.PAD_L, sc.PAD_R), (0, 1)))
        return xp.transpose(0, 3, 1, 2).reshape(B, 4, (H + 4) * (W + 128))
    print(f"pad/transpose pre: {timeit(jax.jit(pre), x):.2f} ms")

if __name__ == "__main__" and os.environ.get("DECOMPOSE"):
    decompose()
