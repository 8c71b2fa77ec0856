#!/usr/bin/env python
"""A/B the Pallas fused window attention vs the XLA path (backbone only)."""

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

from panoswintransformerobjectdetection_tpu.models.panoswin import PanoSwinTransformer


def bench(fused, variables=None):
    m = PanoSwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                            num_heads=(3, 6, 12, 24), window_size=7,
                            ape=True, drop_path_rate=0.0,
                            dtype="bfloat16", fused_attention=fused)
    B, H, W = 4, 512, 1024
    x = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    if variables is None:
        variables = m.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def run(x):
        return m.apply(variables, x)

    def sync(out):
        # block_until_ready does not sync through the axon tunnel; fetch a
        # scalar instead
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    sync(run(x))
    sync(run(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = run(x)
    sync(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"fused={fused}: {dt * 1000:.1f} ms/batch "
          f"({B / dt:.1f} img/s backbone-only)", flush=True)
    return variables


if __name__ == "__main__":
    v = bench(False)
    bench(True, v)
