#!/usr/bin/env bash
# One serialized TPU session: probe the tunnel, then run every pending
# perf A/B in sequence (only ONE real chip — never run these in parallel).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== probe"
timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
print(np.asarray((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]), jax.devices())
" || { echo "TUNNEL DOWN"; exit 7; }

echo "=== roi align A/B (pallas fused crop vs xla einsum pair)"
timeout 2400 python tools/bench_roi_align.py

echo "=== packed attention A/B"
timeout 2400 python tools/bench_packed_attention.py

echo "=== stage profile"
timeout 2400 python tools/profile_components.py

echo "=== bench.py (current defaults)"
timeout 1800 python bench.py

echo "=== bench.py B=8"
timeout 1800 env BENCH_B=8 python bench.py
