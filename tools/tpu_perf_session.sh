#!/usr/bin/env bash
# One serialized TPU session: probe the tunnel, then run every pending
# perf measurement in sequence (only ONE real chip — never run these in
# parallel).  Round-4 focus: backbone non-stem anatomy, train-step
# profile, then bench.py.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== probe"
timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(np.asarray((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]), jax.devices())
" || { echo "TUNNEL DOWN"; exit 7; }

echo "=== backbone per-stage profile"
timeout 2400 python tools/profile_backbone.py

echo "=== block anatomy (localize the non-stem 30 ms)"
timeout 2400 python tools/bench_block_anatomy.py

echo "=== train-step stage profile"
timeout 2400 python tools/profile_train.py || true

echo "=== bench.py (current defaults)"
timeout 1800 python bench.py
