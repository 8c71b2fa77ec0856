"""TTA (aug_test) smoke test on a tiny detector."""

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.apis.tta import aug_test_detector


def test_aug_test_runs(rng):
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_detector import tiny_detector
    det = tiny_detector()
    imgs = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    img = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
    out = aug_test_detector(det, variables, img, scales=((64, 1333),), flip=True,
                            num_classes=5)
    assert "boxes" in out and "scores" in out and "labels" in out
    if len(out["boxes"]):
        assert out["boxes"].shape[1] == 4
        assert (out["scores"] > 0.05).all()
