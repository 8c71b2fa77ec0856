"""Tracing / profiling helpers (`mmdet/utils/profiling.py` analogue).

`profile_time` wraps a host-side wall-clock timer with device sync
(`hard_sync` replaces torch.cuda.synchronize); `device_trace` captures an
XLA device trace viewable in TensorBoard/Perfetto (the
torch.autograd.profiler role).
"""

import contextlib
import time


def hard_sync(tree):
    """Block until all device work producing `tree` has finished.

    `jax.block_until_ready` returns immediately through the axon TPU
    tunnel, and a full-tensor device->host fetch rides a ~70 MB/s link —
    so the only reliable, cheap sync is fetching ONE SCALAR of one leaf.
    Use this (not block_until_ready) around anything timed.
    """
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


@contextlib.contextmanager
def profile_time(name: str, sync_value=None, stream=print):
    """Times the block; if `sync_value` is given, blocks on it first so
    device work is included."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_value is not None:
            hard_sync(sync_value)
        stream(f"[profile] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA profiler trace to `log_dir` (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
