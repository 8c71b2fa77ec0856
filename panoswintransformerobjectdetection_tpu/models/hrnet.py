"""HRNet backbone + HRFPN neck (`mmdet/models/backbones/hrnet.py`,
`necks/hrfpn.py`).

Parallel multi-resolution branches with repeated cross-resolution fusion;
stage widths follow the HRNetV2-W presets.  HRFPN concatenates all
branches at the highest resolution and pools out a pyramid.
"""

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .registry import BACKBONES, NECKS
from .resnet import Bottleneck, BasicBlock, _bn
from .fpn import nearest_upsample

HRNET_CFG = {
    18: ((18, 36), (18, 36, 72), (18, 36, 72, 144)),
    32: ((32, 64), (32, 64, 128), (32, 64, 128, 256)),
    40: ((40, 80), (40, 80, 160), (40, 80, 160, 320)),
}
STAGE_MODULES = (1, 4, 3)   # modules per stage 2/3/4
BLOCKS_PER_BRANCH = 4


class FuseLayer(nn.Module):
    """Cross-resolution exchange: every branch receives every other branch
    (1x1 conv + upsample for coarser, strided 3x3 chain for finer)."""
    widths: Sequence[int]

    @nn.compact
    def __call__(self, xs, train=False):
        n = len(xs)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:      # coarser -> upsample
                    y = nn.Conv(self.widths[i], (1, 1), use_bias=False,
                                name=f"f{i}_{j}_conv")(y)
                    y = _bn(f"f{i}_{j}_bn", train)(y)
                    y = nearest_upsample(y, xs[i].shape[1], xs[i].shape[2])
                elif j < i:    # finer -> strided conv chain
                    for s in range(i - j):
                        ch = self.widths[i] if s == i - j - 1 else self.widths[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                    use_bias=False,
                                    name=f"f{i}_{j}_d{s}_conv")(y)
                        y = _bn(f"f{i}_{j}_d{s}_bn", train)(y)
                        if s != i - j - 1:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    widths: Sequence[int]

    @nn.compact
    def __call__(self, xs, train=False):
        ys = []
        for bi, (x, w) in enumerate(zip(xs, self.widths)):
            for k in range(BLOCKS_PER_BRANCH):
                x = BasicBlock(planes=w, name=f"b{bi}_{k}")(x, train=train)
            ys.append(x)
        return FuseLayer(self.widths, name="fuse")(ys, train=train)


@BACKBONES.register
class HRNet(nn.Module):
    width: int = 32
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        cfg = HRNET_CFG[self.width]
        # stem: two stride-2 convs, then 4 bottlenecks at 64
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1", bn_train)(x))
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="conv2")(x)
        x = nn.relu(_bn("bn2", bn_train)(x))
        for k in range(4):
            x = Bottleneck(planes=64, downsample=k == 0,
                           name=f"layer1_{k}")(x, train=bn_train)

        xs = [x]
        for si, widths in enumerate(cfg):
            # transition: adapt channel counts, add one finer branch
            new_xs = []
            for bi, w in enumerate(widths):
                if bi < len(xs):
                    y = xs[bi]
                    if y.shape[-1] != w:
                        y = nn.Conv(w, (3, 3), padding=1, use_bias=False,
                                    name=f"t{si}_{bi}_conv")(y)
                        y = nn.relu(_bn(f"t{si}_{bi}_bn", bn_train)(y))
                else:
                    y = nn.Conv(w, (3, 3), strides=(2, 2), padding=1,
                                use_bias=False, name=f"t{si}_{bi}_conv")(xs[-1])
                    y = nn.relu(_bn(f"t{si}_{bi}_bn", bn_train)(y))
                new_xs.append(y)
            xs = new_xs
            for m in range(STAGE_MODULES[si]):
                xs = HRModule(widths, name=f"stage{si + 2}_m{m}")(
                    xs, train=bn_train)
        return tuple(xs)


@NECKS.register
class HRFPN(nn.Module):
    """Concat all branches at the top resolution, 1x1 reduce, avg-pool out
    a 5-level pyramid with per-level 3x3 convs (`hrfpn.py`)."""
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats):
        h, w = feats[0].shape[1:3]
        cat = jnp.concatenate(
            [feats[0]] + [nearest_upsample(f, h, w) for f in feats[1:]], -1)
        x = nn.Conv(self.out_channels, (1, 1), name="reduction")(cat)
        outs = []
        cur = x
        for i in range(self.num_outs):
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=1,
                                name=f"fpn_{i}")(cur))
            if i < self.num_outs - 1:
                cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        return tuple(outs)
