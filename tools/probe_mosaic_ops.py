#!/usr/bin/env python
"""Probe which layout ops Mosaic lowers on this chip (bf16, v5e).

Each probe is a minimal pallas kernel exercising ONE op the fused stem
kernel design needs; prints OK / the Mosaic error class.  Run serialized
with other TPU work.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

R, C, CH = 36, 288, 32  # C mult of 16 (bf16 sublane tile)


def run(name, kernel, out_shape, x):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        y = jax.jit(f)(x)
        np.asarray(y).reshape(-1)[0]
        print(f"OK    {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL  {name}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.random((R, C, CH)), jnp.bfloat16)
    dt = jnp.bfloat16

    # 1. static roll along sublane (axis=1) of 3-D
    run("roll sublane 3-D",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., jnp.roll(x_ref[...], 1, axis=1)),
        jax.ShapeDtypeStruct((R, C, CH), dt), x3)

    # 2. flatten (R, C, ch) -> (R*C, ch), C mult of 16
    run("flatten aligned (R,C,ch)->(R*C,ch)",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., x_ref[...].reshape(R * C, CH)),
        jax.ShapeDtypeStruct((R * C, CH), dt), x3)

    # 3. unflatten (R*C, ch) -> (R, C, ch)
    x2 = x3.reshape(R * C, CH)
    run("unflatten (R*C,ch)->(R,C,ch)",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., x_ref[...].reshape(R, C, CH)),
        jax.ShapeDtypeStruct((R, C, CH), dt), x2)

    # 4. merge 4 sublane rows into lanes: (M*4, 64) -> (M, 256)
    M = 512
    xm = jnp.asarray(rng.random((M * 4, 64)), jnp.bfloat16)
    run("merge rows->lanes (M*4,64)->(M,256)",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., x_ref[...].reshape(M, 256)),
        jax.ShapeDtypeStruct((M, 256), dt), xm)

    # 5. concat 3 rolled taps along minor dim
    def k_concat(x_ref, o_ref):
        x = x_ref[...]
        taps = [jnp.roll(x, s, axis=1) for s in (-1, 0, 1)]
        o_ref[...] = jnp.concatenate(taps, axis=-1)
    run("concat 3 rolls minor dim",
        k_concat, jax.ShapeDtypeStruct((R, C, 3 * CH), dt), x3)

    # 6. dim0 slice (free dim) at odd offset
    run("dim0 slice odd offset",
        lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[3:35]),
        jax.ShapeDtypeStruct((32, C, CH), dt), x3)

    # 7. dim0 split reshape (R, C, ch) -> (R//4, 4, C, ch)
    run("dim0 split (R,C,ch)->(R/4,4,C,ch)",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., x_ref[...].reshape(R // 4, 4, C, CH)),
        jax.ShapeDtypeStruct((R // 4, 4, C, CH), dt), x3)

    # 8. sublane slice at offset 16 (aligned)
    run("sublane slice offset 16 len 256",
        lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[:, 16:272, :]),
        jax.ShapeDtypeStruct((R, 256, CH), dt), x3)

    # 9. sublane slice at offset 1 (unaligned)
    run("sublane slice offset 1 len 256",
        lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[:, 1:257, :]),
        jax.ShapeDtypeStruct((R, 256, CH), dt), x3)

    # 10. flat GEMM on merged taps: (R*C, 96) @ (96, 64)
    w = jnp.asarray(rng.random((3 * CH, 64)), jnp.bfloat16)
    def k_gemm(x_ref, w_ref, o_ref):
        x = x_ref[...]
        taps = [jnp.roll(x, s, axis=1) for s in (-1, 0, 1)]
        p = jnp.concatenate(taps, axis=-1).reshape(R * C, 3 * CH)
        o_ref[...] = jax.lax.dot_general(
            p, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
    try:
        y = jax.jit(pl.pallas_call(
            k_gemm, out_shape=jax.ShapeDtypeStruct((R * C, 64), dt)))(x3, w)
        np.asarray(y).reshape(-1)[0]
        print("OK    roll+concat+flatten+GEMM pipeline")
    except Exception as e:
        print(f"FAIL  roll+concat+flatten+GEMM: {str(e).splitlines()[0][:140]}")

    # 11. sublane split (A*B, C) -> (A, B, C), B mult 16
    run("sublane split (M,256)->(M/16,16,256)... wait dim0 split 2-D",
        lambda x_ref, o_ref: o_ref.__setitem__(
            ..., x_ref[...].reshape(M, 4, 64)),
        jax.ShapeDtypeStruct((M, 4, 64), dt), xm)


if __name__ == "__main__":
    main()
