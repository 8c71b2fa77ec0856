"""ResNet / ResNeXt backbones (model-zoo coverage, `mmdet/models/backbones/resnet.py`).

NHWC flax implementation of torchvision-style ResNet as used by mmdet:
7x7 stem + BN + ReLU + 3x3/2 maxpool, bottleneck stages with stride-2 at
the first block (style='pytorch': stride on the 3x3), dilation support,
`frozen_stages` via stop_gradient, outputs the four stage features.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .registry import BACKBONES


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = _bn("bn2", train)(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    style: str = "pytorch"    # 'pytorch': stride on the 3x3; 'caffe': on the 1x1
    use_dcn: bool = False     # configs/dcn: deformable 3x3 (DCNv2)
    use_gcb: bool = False     # configs/gcnet: ContextBlock after conv3
    gcb_ratio: float = 1.0 / 16
    # configs/empirical_attention: GeneralizedAttention after conv2
    gen_attention: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train=False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        # `mmdet/models/backbones/resnet.py` Bottleneck: conv1_stride/
        # conv2_stride swap under style='caffe'
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        identity = x
        y = nn.Conv(width, (1, 1), strides=(s1, s1), use_bias=False,
                    name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        if self.use_dcn:
            from ..ops.deform_conv import DCN
            y = DCN(width, kernel_size=3, stride=s2,
                    use_bias=False, name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3), strides=(s2, s2),
                        padding=self.dilation, kernel_dilation=self.dilation,
                        feature_group_count=self.groups, use_bias=False,
                        name="conv2")(y)
        y = nn.relu(_bn("bn2", train)(y))
        if self.gen_attention:
            from ..ops.gen_attention import GeneralizedAttention
            ga = {k: v for k, v in self.gen_attention.items() if k != "type"}
            y = GeneralizedAttention(in_channels=width, name="gen_attention",
                                     **ga)(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = _bn("bn3", train)(y)
        if self.use_gcb:
            from ..ops.deform_conv import ContextBlock
            y = ContextBlock(y.shape[-1], ratio=self.gcb_ratio,
                             name="context_block")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(y + identity)


ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register
class ResNet(nn.Module):
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    groups: int = 1
    base_width: int = 64
    style: str = "pytorch"
    norm_eval: bool = True
    # configs/dcn: dcn=dict(type='DCNv2'), stage_with_dcn=(F, T, T, T)
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    # configs/gcnet: gcb=dict(ratio=1/4.), stage_with_gcb=(F, T, T, T)
    gcb: Optional[dict] = None
    stage_with_gcb: Sequence[bool] = (False, False, False, False)
    # configs/empirical_attention: gen_attention=dict(num_heads=8,
    # attention_type='1111', kv_stride=2),
    # stage_with_gen_attention=(F, F, T, T)  (plugin position after_conv2)
    gen_attention: Optional[dict] = None
    stage_with_gen_attention: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x, train=False, rfp_feats=None):
        """rfp_feats: optional per-stage feedback maps (DetectoRS RFP,
        `detectors_resnet.py` rfp_inplanes): stage i's output receives a
        1x1 conv of rfp_feats[i] (zero-init so the first unrolled step is
        the plain backbone)."""
        block_cls, depths = ARCH[self.depth]
        bn_train = train and not self.norm_eval
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1", bn_train)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, d in enumerate(depths):
            planes = 64 * 2 ** i
            for j in range(d):
                stride = self.strides[i] if j == 0 else 1
                exp = getattr(block_cls, "expansion", 1) if block_cls is Bottleneck else 1
                need_ds = j == 0 and (stride != 1 or i > 0 or block_cls is Bottleneck)
                extra = {}
                if block_cls is Bottleneck:
                    extra = dict(
                        style=self.style,
                        use_dcn=bool(self.dcn) and self.stage_with_dcn[i],
                        use_gcb=bool(self.gcb) and self.stage_with_gcb[i],
                        gcb_ratio=(self.gcb or {}).get("ratio", 1.0 / 16),
                        gen_attention=(self.gen_attention
                                       if self.gen_attention
                                       and self.stage_with_gen_attention[i]
                                       else None))
                x = block_cls(planes=planes, stride=stride,
                              dilation=self.dilations[i],
                              downsample=need_ds, groups=self.groups,
                              base_width=self.base_width, **extra,
                              name=f"layer{i + 1}_{j}")(x, train=bn_train)
            if rfp_feats is not None and rfp_feats[i] is not None:
                x = x + nn.Conv(x.shape[-1], (1, 1),
                                kernel_init=nn.initializers.zeros,
                                name=f"rfp_conv{i + 1}")(rfp_feats[i])
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register
class ResNeXt(ResNet):
    groups: int = 32
    base_width: int = 4
