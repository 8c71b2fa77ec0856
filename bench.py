"""Benchmark: batched equirectangular inference throughput on one TPU chip.

Protocol mirrors the reference's `tools/analysis_tools/benchmark.py`
(network + post-processing only, steady-state average): full PanoSwin-T
Faster R-CNN `simple_test` (backbone -> FPN -> RPN+NMS -> RoIAlign -> heads
-> multiclass NMS) on 512x1024 equirect frames.

vs_baseline: the only fps number published in-tree is Mask R-CNN R50-FPN at
16.1 fps on V100 (`configs/mask_rcnn/README.md:23`, BASELINE.md); we report
images/sec/chip relative to that figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp
    from __graft_entry__ import _flagship

    B, H, W = 4, 512, 1024
    det = _flagship(compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))
    det_infer = _flagship(compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                          fuse_bn=True)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    variables = det.init(rng, images[:1])
    # inference-mode conv+BN fusion (stem runs at full input resolution)
    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        fold_batchnorm)
    fp, fbs = fold_batchnorm(variables["params"], variables["batch_stats"])
    variables = {"params": fp, "batch_stats": fbs}
    det = det_infer   # structurally skips the (now-identity) stem BN
    img_shapes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))
    scale_factors = jnp.ones((B, 4), jnp.float32)

    @jax.jit
    def run(images):
        return det.apply(variables, images, img_shapes, scale_factors,
                         method=det.simple_test)

    # warmup / compile
    jax.block_until_ready(run(images))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = B * iters / dt

    baseline_fps = 16.1  # Mask R-CNN R50-FPN V100 (configs/mask_rcnn/README.md:23)
    print(json.dumps({
        "metric": "panoswin_t_faster_rcnn_infer_512x1024",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
