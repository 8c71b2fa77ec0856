"""Tracing / profiling helpers (`mmdet/utils/profiling.py` analogue).

`profile_time` wraps a host-side wall-clock timer with device sync
(`jax.block_until_ready` replaces torch.cuda.synchronize); `device_trace`
captures an XLA device trace viewable in TensorBoard/Perfetto (the
torch.autograd.profiler role).
"""

import contextlib
import time


@contextlib.contextmanager
def profile_time(name: str, sync_value=None, stream=print):
    """Times the block; if `sync_value` is given, blocks on it first so
    device work is included."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_value is not None:
            import jax
            jax.block_until_ready(sync_value)
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
