"""Direct parity of `interpolate_bicubic` / `resize_bias_table` against
torch `F.interpolate(mode='bicubic')` (the A = -0.75 cubic kernel the
reference uses for ape and relative-position bias-table resizing,
`mmcv_custom/checkpoint.py:336-352`)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from panoswintransformerobjectdetection_tpu.geometry.resample import (
    interpolate_bicubic)
from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
    resize_bias_table)


@pytest.mark.parametrize("shape", [((1, 56, 56, 8), (128, 256)),
                                   ((2, 13, 13, 3), (7, 7)),
                                   ((1, 5, 9, 4), (11, 3))])
@pytest.mark.parametrize("align", [False, True])
def test_matches_torch_bicubic(shape, align):
    (b, h, w, c), (oh, ow) = shape
    x = np.random.default_rng(0).random((b, h, w, c)).astype(np.float32)
    ours = np.asarray(interpolate_bicubic(jnp.asarray(x), oh, ow,
                                          align_corners=align))
    ref = torch.nn.functional.interpolate(
        torch.tensor(np.moveaxis(x, -1, 1)), size=(oh, ow), mode="bicubic",
        align_corners=align)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    assert np.abs(ours - ref).max() < 1e-5


def test_bias_table_resize_matches_torch():
    # 7 -> 12 window: 13x13 -> 23x23 table, the Swin checkpoint-conversion
    # path (bicubic per head channel)
    t = np.random.default_rng(1).random((169, 6)).astype(np.float32)
    ours = resize_bias_table(t, 7, 12)
    ref = torch.nn.functional.interpolate(
        torch.tensor(t.T.reshape(1, 6, 13, 13)), size=(23, 23),
        mode="bicubic", align_corners=False)
    ref = ref.numpy().reshape(6, 23 * 23).T
    assert ours.shape == (529, 6)
    assert np.abs(ours - ref).max() < 1e-5
