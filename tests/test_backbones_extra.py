"""RegNet / Res2Net backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models.backbones_extra import (
    RegNet, Res2Net, REGNET_ARCH)


def test_regnet_shapes(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = RegNet(arch="regnetx_400mf")
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == list(REGNET_ARCH["regnetx_400mf"]["widths"])
    assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2


def test_res2net_shapes(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = Res2Net(depth=50)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_res2net_grad(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    m = Res2Net(depth=50, out_indices=(3,))
    v = m.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: m.apply({"params": p, "batch_stats": v["batch_stats"]},
                                   x)[0].sum())(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_resnest_shapes(rng):
    from panoswintransformerobjectdetection_tpu.models.backbones_extra import ResNeSt
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = ResNeSt(depth=50)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_trident_resnet(rng):
    from panoswintransformerobjectdetection_tpu.models.backbones_extra import (
        TridentResNet)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    m = TridentResNet(depth=50)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # shared trident kernel exists once
    assert "conv2_kernel" in v["params"]["layer3_1"]
