#!/usr/bin/env python
"""Throughput benchmark (reference `tools/analysis_tools/benchmark.py`):
warmup then timed steady-state fps of jitted simple_test."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from panoswintransformerobjectdetection_tpu.utils.profiling import hard_sync
    from panoswintransformerobjectdetection_tpu.apis.inference import init_detector

    if args.config:
        det, variables = init_detector(args.config)
    else:
        from __graft_entry__ import _flagship
        det = _flagship()
        variables = det.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))

    B, H, W = args.batch_size, args.height, args.width
    images = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    shapes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))
    sf = jnp.ones((B, 4), jnp.float32)

    @jax.jit
    def run(images):
        return det.apply(variables, images, shapes, sf, method=det.simple_test)

    for _ in range(args.warmup):
        out = run(images)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(images)
    hard_sync(out)
    dt = time.perf_counter() - t0
    print(f"fps: {B * args.iters / dt:.2f} img/s  "
          f"({dt / args.iters * 1000:.1f} ms/batch of {B})")


if __name__ == "__main__":
    main()
