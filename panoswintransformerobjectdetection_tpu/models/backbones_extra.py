"""Additional model-zoo backbones: RegNet, Res2Net
(`mmdet/models/backbones/regnet.py`, `res2net.py`).

RegNetX: per-stage (width, depth, groups) from the standard presets;
bottleneck ratio 1, group convs, stride-2 first block per stage.
Res2Net: ResNet bottlenecks whose 3x3 is replaced by `scales` hierarchical
sub-convs over channel splits.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .registry import BACKBONES
from .resnet import _bn

REGNET_ARCH: Dict[str, dict] = {
    # widths/depths/groups per stage (RegNetX presets as used by mmdet)
    "regnetx_400mf": {"widths": (32, 64, 160, 384), "depths": (1, 2, 7, 12),
                      "groups": 16},
    "regnetx_800mf": {"widths": (64, 128, 288, 672), "depths": (1, 3, 7, 5),
                      "groups": 16},
    "regnetx_1.6gf": {"widths": (72, 168, 408, 912), "depths": (2, 4, 10, 2),
                      "groups": 24},
    "regnetx_3.2gf": {"widths": (96, 192, 432, 1008), "depths": (2, 6, 15, 2),
                      "groups": 48},
    "regnetx_4.0gf": {"widths": (80, 240, 560, 1360), "depths": (2, 5, 14, 2),
                      "groups": 40},
    "regnetx_6.4gf": {"widths": (168, 392, 784, 1624), "depths": (2, 4, 10, 1),
                      "groups": 56},
    "regnetx_8.0gf": {"widths": (80, 240, 720, 1920), "depths": (2, 5, 15, 1),
                      "groups": 120},
    "regnetx_12gf": {"widths": (224, 448, 896, 2240), "depths": (2, 5, 11, 1),
                     "groups": 112},
}


class RegBlock(nn.Module):
    width: int
    stride: int = 1
    groups: int = 16
    downsample: bool = False
    use_dcn: bool = False    # regnet mdconv_c3-c5 configs

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        # group width must divide stage width; presets guarantee it
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        if self.use_dcn:
            from ..ops.deform_conv import DCN
            y = DCN(self.width, kernel_size=3, stride=self.stride,
                    use_bias=False, name="conv2")(y)
        else:
            y = nn.Conv(self.width, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=1,
                        feature_group_count=self.width // self.groups
                        if self.width % self.groups == 0 else 1,
                        use_bias=False, name="conv2")(y)
        y = nn.relu(_bn("bn2", train)(y))
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn("bn3", train)(y)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(y + identity)


@BACKBONES.register
class RegNet(nn.Module):
    arch: str = "regnetx_3.2gf"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True
    # mask_rcnn_regnetx-3.2GF_fpn_mdconv_c3-c5_1x_coco
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x, train=False):
        cfg = REGNET_ARCH[self.arch]
        bn_train = train and not self.norm_eval
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1", bn_train)(x))
        outs = []
        for i, (w, d) in enumerate(zip(cfg["widths"], cfg["depths"])):
            for j in range(d):
                x = RegBlock(width=w, stride=2 if j == 0 else 1,
                             groups=cfg["groups"], downsample=j == 0,
                             use_dcn=bool(self.dcn)
                             and self.stage_with_dcn[i],
                             name=f"layer{i + 1}_{j}")(x, train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class Res2Block(nn.Module):
    planes: int
    stride: int = 1
    scales: int = 4
    base_width: int = 26
    downsample: bool = False
    expansion: int = 4
    use_dcn: bool = False    # vfnet_r2_101_fpn_mdconv_c3-c5: DCN 3x3 scales

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        width = int(self.planes * (self.base_width / 64.0)) * self.scales
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        sw = width // self.scales
        splits = [y[..., i * sw:(i + 1) * sw] for i in range(self.scales)]
        outs = []
        prev = None
        for i in range(self.scales):
            if i == 0:
                outs.append(splits[0] if self.stride == 1 else
                            nn.avg_pool(splits[0], (3, 3),
                                        strides=(self.stride, self.stride),
                                        padding=((1, 1), (1, 1))))
                continue
            inp = splits[i] if (prev is None or self.stride != 1) \
                else splits[i] + prev
            if self.use_dcn:
                from ..ops.deform_conv import DCN
                o = DCN(sw, kernel_size=3, stride=self.stride,
                        use_bias=False, name=f"conv2_{i}")(inp)
            else:
                o = nn.Conv(sw, (3, 3), strides=(self.stride, self.stride),
                            padding=1, use_bias=False, name=f"conv2_{i}")(inp)
            o = nn.relu(_bn(f"bn2_{i}", train)(o))
            outs.append(o)
            prev = o
        y = jnp.concatenate(outs, -1)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = _bn("bn3", train)(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(y + identity)


@BACKBONES.register
class Res2Net(nn.Module):
    depth: int = 50
    scales: int = 4
    base_width: int = 26
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True
    # vfnet_r2_101_fpn_mdconv_c3-c5: dcn=dict(type='DCNv2'),
    # stage_with_dcn=(False, True, True, True)
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x, train=False):
        depths = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bn_train = train and not self.norm_eval
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1", bn_train)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        for i, d in enumerate(depths):
            planes = 64 * 2 ** i
            for j in range(d):
                x = Res2Block(planes=planes, stride=2 if (j == 0 and i > 0) else 1,
                              scales=self.scales, base_width=self.base_width,
                              downsample=j == 0,
                              use_dcn=bool(self.dcn)
                              and self.stage_with_dcn[i],
                              name=f"layer{i + 1}_{j}")(x, train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention 3x3 (`resnest.py` SplAtConv2d): radix
    feature groups reweighted by a softmax over radix computed from the
    pooled sum."""
    channels: int
    radix: int = 2
    reduction: int = 4
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        r, c = self.radix, self.channels
        y = nn.Conv(c * r, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv")(x)
        y = nn.relu(_bn("bn", train)(y))
        B, H, W, _ = y.shape
        y = y.reshape(B, H, W, r, c)
        gap = y.sum(3).mean(axis=(1, 2))                  # (B, c)
        inter = max(c * r // self.reduction, 32)
        a = nn.relu(_bn("fc1_bn", train)(
            nn.Dense(inter, name="fc1")(gap)))
        a = nn.Dense(c * r, name="fc2")(a).reshape(B, r, c)
        a = jax.nn.softmax(a, axis=1)                     # rsoftmax over radix
        return (y * a[:, None, None, :, :]).sum(3)


class ResNeStBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = SplitAttentionConv(self.planes, radix=self.radix,
                               name="splat")(y, train=train)
        if self.stride > 1:  # ResNeSt-D: avg-pool downsample after splat
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = _bn("bn3", train)(y)
        if self.downsample:
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride, self.stride),
                                       strides=(self.stride, self.stride))
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False, name="downsample_conv")(identity)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(y + identity)


@BACKBONES.register
class ResNeSt(nn.Module):
    depth: int = 50
    radix: int = 2
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        depths = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bn_train = train and not self.norm_eval
        # deep stem (3x 3x3)
        for i, ch in enumerate((32, 32, 64)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=1, use_bias=False, name=f"stem{i}")(x)
            x = nn.relu(_bn(f"stem_bn{i}", bn_train)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        for i, d in enumerate(depths):
            planes = 64 * 2 ** i
            for j in range(d):
                x = ResNeStBlock(planes=planes,
                                 stride=2 if (j == 0 and i > 0) else 1,
                                 downsample=j == 0, radix=self.radix,
                                 name=f"layer{i + 1}_{j}")(x, train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class TridentBlock(nn.Module):
    """Trident bottleneck (`trident_resnet.py`): the 3x3 conv kernel is
    SHARED across `num_branches` parallel paths that differ only by
    dilation (scale-aware branches); branch outputs stay parallel."""
    planes: int
    dilations: Sequence[int] = (1, 2, 3)
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, xs, train=False):
        # xs: list of branch tensors (same shape)
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")
        k3 = self.param("conv2_kernel", nn.initializers.he_normal(),
                        (3, 3, self.planes, self.planes))
        conv3 = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                        name="conv3")
        ds = None
        if self.downsample:
            ds = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                         name="downsample_conv")
        outs = []
        for bi, (x, d) in enumerate(zip(xs, self.dilations)):
            y = nn.relu(_bn(f"bn1_{bi}", train)(conv1(x)))
            y = jax.lax.conv_general_dilated(
                y, k3, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(_bn(f"bn2_{bi}", train)(y))
            y = _bn(f"bn3_{bi}", train)(conv3(y))
            idn = x
            if ds is not None:
                idn = _bn(f"downsample_bn_{bi}", train)(ds(x))
            outs.append(nn.relu(y + idn))
        return outs


@BACKBONES.register
class TridentResNet(nn.Module):
    """ResNet-50 whose res4 stage is tridented; test path keeps the middle
    branch (the 'fast' TridentNet approximation)."""
    depth: int = 50
    num_trident_blocks: int = 3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        from .resnet import Bottleneck
        depths = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bn_train = train and not self.norm_eval
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1", bn_train)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        for i, d in enumerate(depths):
            planes = 64 * 2 ** i
            if i == 2:  # tridented stage
                xs = [x, x, x]
                for j in range(d):
                    if j == 0:
                        # stride-2 entry handled per-branch by a plain block
                        xs = [Bottleneck(planes=planes, stride=2,
                                         downsample=True,
                                         name=f"layer3_entry")(x, train=bn_train)] * 3
                    else:
                        xs = TridentBlock(planes=planes,
                                          name=f"layer3_{j}")(xs, train=bn_train)
                x = xs[1]   # middle branch feeds onward (fast inference)
            else:
                for j in range(d):
                    stride = 2 if (j == 0 and i > 0) else 1
                    x = Bottleneck(planes=planes, stride=stride,
                                   downsample=j == 0,
                                   name=f"layer{i + 1}_{j}")(x, train=bn_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
