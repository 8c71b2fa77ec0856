"""Stacked Hourglass backbone (`mmdet/models/backbones/hourglass.py`,
CornerNet's HourglassNet-104): recursive down/up modules with skip
residuals, 2 stacks with inter-stack remap convs.
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .registry import BACKBONES
from .resnet import BasicBlock, _bn
from .fpn import nearest_upsample

STAGE_CHANNELS = (256, 256, 384, 384, 384, 512)


class HGModule(nn.Module):
    """One recursive hourglass level."""
    depth: int
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, train=False):
        c_cur = self.channels[0]
        c_next = self.channels[1]
        up1 = BasicBlock(planes=c_cur, downsample=x.shape[-1] != c_cur,
                         name="up1")(x, train=train)
        low1 = BasicBlock(planes=c_next, stride=2, downsample=True,
                          name="low1")(x, train=train)
        if self.depth > 1:
            low2 = HGModule(self.depth - 1, self.channels[1:],
                            name="low2")(low1, train=train)
        else:
            low2 = BasicBlock(planes=c_next, name="low2")(low1, train=train)
        low3 = BasicBlock(planes=c_cur, downsample=True,
                          name="low3")(low2, train=train)
        up2 = nearest_upsample(low3, up1.shape[1], up1.shape[2])
        return up1 + up2


@BACKBONES.register
class HourglassNet(nn.Module):
    num_stacks: int = 2
    depth: int = 5
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        bn_train = train and not self.norm_eval
        ch = STAGE_CHANNELS[0]
        x = nn.Conv(128, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu(_bn("stem_bn", bn_train)(x))
        x = BasicBlock(planes=ch, stride=2, downsample=True,
                       name="stem_res")(x, train=bn_train)

        outs = []
        for s in range(self.num_stacks):
            hg = HGModule(self.depth, STAGE_CHANNELS,
                          name=f"hg_{s}")(x, train=bn_train)
            feat = nn.relu(_bn(f"out_bn_{s}", bn_train)(
                nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        name=f"out_conv_{s}")(hg)))
            outs.append(feat)
            if s < self.num_stacks - 1:
                # inter-stack remap (CornerNet style)
                a = nn.Conv(ch, (1, 1), use_bias=False, name=f"remap_x_{s}")(x)
                a = _bn(f"remap_x_bn_{s}", bn_train)(a)
                b = nn.Conv(ch, (1, 1), use_bias=False, name=f"remap_f_{s}")(feat)
                b = _bn(f"remap_f_bn_{s}", bn_train)(b)
                x = nn.relu(a + b)
        return tuple(outs)
