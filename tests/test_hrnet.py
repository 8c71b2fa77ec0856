"""HRNet + HRFPN tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models.hrnet import HRNet, HRFPN


def test_hrnet_branches(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = HRNet(width=18)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_hrfpn(rng):
    feats = tuple(jnp.asarray(
        rng.random((1, 16 // 2**i, 16 // 2**i, c)).astype(np.float32))
        for i, c in enumerate((18, 36, 72, 144)))
    neck = HRFPN(in_channels=(18, 36, 72, 144), out_channels=32)
    v = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[4].shape == (1, 1, 1, 32)


def test_hrnet_grad(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    m = HRNet(width=18)
    v = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: sum(
        o.sum() for o in m.apply({"params": p, "batch_stats": v["batch_stats"]}, x))
    )(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
