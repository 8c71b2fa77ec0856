"""Feature Pyramid Grids neck (`mmdet/models/necks/fpg.py`, configs/fpg).

FPG views the feature pyramid as a 2-D grid: `stack_times` pathway stages,
each connecting every level to the next stage through a fixed multi-
directional wiring — same-level lateral, bottom-up (stride-2 conv from the
level below), top-down (upsample from the level above), and a skip from
the corresponding stage-0 level.  All fusion is by summation followed by
ReLU + 3x3 conv, the paper's inter-conv form.  Upsampling reuses the
gather-free `nearest_upsample`.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import resolve_dtype
from .fpn import nearest_upsample, max_pool_s2
from .registry import NECKS


@NECKS.register
class FPG(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    start_level: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        dt = resolve_dtype(self.dtype)
        used = list(feats[self.start_level:])
        if dt is not None:
            used = [f.astype(dt) for f in used]
        # entry laterals + pooled extras to num_outs levels
        levels = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        while len(levels) < self.num_outs:
            levels.append(max_pool_s2(levels[-1]))
        skip = levels

        for s in range(self.stack_times):
            nxt = []
            for i in range(self.num_outs):
                acc = levels[i] + skip[i]
                if i > 0:
                    acc = acc + nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2), padding=1,
                        dtype=dt, name=f"s{s}_bu_{i}")(levels[i - 1])
                if i < self.num_outs - 1:
                    h, w = levels[i].shape[1:3]
                    acc = acc + nearest_upsample(levels[i + 1], h, w)
                acc = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                              name=f"s{s}_conv_{i}")(nn.relu(acc))
                nxt.append(acc)
            levels = nxt
        return tuple(levels)
