"""Hourglass backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models.hourglass import HourglassNet


def test_hourglass_stacks(rng):
    x = jnp.asarray(rng.random((1, 128, 128, 3)).astype(np.float32))
    m = HourglassNet(num_stacks=2, depth=3)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 32, 32, 256)
        assert np.isfinite(np.asarray(o)).all()
