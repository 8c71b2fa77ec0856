"""Spatial (sequence) sharding primitives for panoramas.

SURVEY.md 5.7: the pano-shift is a topology-aware sequence rotation; when
the W axis of an equirect map is sharded over devices, the horizontal roll
(and the seam wrap) becomes a ring exchange over ICI.  `sharded_roll`
implements roll(x, shift, axis=W) for a W-sharded map with a single
`ppermute` of the `shift`-wide halo — the building block for spatially
sharded PanoSwin (data-parallel whole images remain the default, matching
the reference's DDP strategy).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _ring_shift_right(block, axis_name):
    """Send `block` to the next device on the ring (device i -> i+1)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(block, axis_name, perm)


def sharded_roll(x_local: jnp.ndarray, shift: int, axis_name: str,
                 w_axis: int = 2) -> jnp.ndarray:
    """roll(+shift) along a device-sharded width axis.

    x_local: this device's (B, H, W_local, C) shard with the global W axis
    sharded over `axis_name`.  Equivalent to jnp.roll on the gathered
    array: the last `shift` columns of each shard move to the next device's
    front (one ppermute of a (B, H, shift, C) halo over ICI).
    """
    w_local = x_local.shape[w_axis]
    assert 0 <= shift <= w_local, "halo exchange supports shift <= shard width"
    if shift == 0:
        return x_local
    tail = jax.lax.slice_in_dim(x_local, w_local - shift, w_local, axis=w_axis)
    incoming = _ring_shift_right(tail, axis_name)
    keep = jax.lax.slice_in_dim(x_local, 0, w_local - shift, axis=w_axis)
    return jnp.concatenate([incoming, keep], axis=w_axis)


def make_sharded_roll(mesh: Mesh, shift: int, axis_name: str = "data"):
    """Returns a jittable global-view function: (B, H, W, C) with W sharded
    over `axis_name` -> rolled by +shift, communicating only the halo."""
    spec = P(None, None, axis_name, None)

    @jax.jit
    def fn(x):
        return shard_map(
            lambda xl: sharded_roll(xl, shift, axis_name),
            mesh=mesh, in_specs=(spec,), out_specs=spec)(x)

    return fn
