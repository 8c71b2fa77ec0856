"""Deformable convolution v1/v2 (`mmcv.ops.DeformConv2d` /
`ModulatedDeformConv2d` role) as bilinear gathers.

Each kernel tap samples the input at its regular location plus a learned
per-position offset (v2 additionally scales by a sigmoid modulation mask);
the K taps become K batched bilinear resamples (`geometry.resample`) and
one einsum against the kernel — all fusible XLA, no custom CUDA.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..geometry.resample import grid_sample_nhwc


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, weights: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  kernel_size: int = 3, dilation: int = 1,
                  modulation: Optional[jnp.ndarray] = None,
                  stride: int = 1) -> jnp.ndarray:
    """x: (B, H, W, C); offsets: (B, Ho, Wo, 2K) as (dy, dx) per tap
    (mmcv channel order); weights: (K, C, Cout); modulation: (B, Ho, Wo, K)
    pre-sigmoid or None.  'same' padding; `stride` samples the output grid
    at strided centers (Ho = H/stride).  Returns (B, Ho, Wo, Cout).
    """
    B, H, W, C = x.shape
    k = kernel_size
    K = k * k
    assert offsets.shape[-1] == 2 * K

    ys = jnp.arange(0, H, stride, dtype=jnp.float32)
    xs = jnp.arange(0, W, stride, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # (H, W)

    taps = []
    half = (k - 1) // 2
    for ki in range(K):
        dy = (ki // k - half) * dilation
        dx = (ki % k - half) * dilation
        oy = offsets[..., 2 * ki]
        ox = offsets[..., 2 * ki + 1]
        sy = gy[None] + dy + oy                           # (B, H, W)
        sx = gx[None] + dx + ox
        # normalize to [-1, 1] (align_corners=False convention)
        ny = (2 * sy + 1) / H - 1
        nx = (2 * sx + 1) / W - 1
        grid = jnp.stack([nx, ny], -1)                    # (B, H, W, 2)
        taps.append(grid_sample_nhwc(x, grid, padding_mode="zeros",
                                     align_corners=False))
    stacked = jnp.stack(taps, axis=3)                     # (B, H, W, K, C)
    if modulation is not None:
        stacked = stacked * jax.nn.sigmoid(modulation)[..., None]
    out = jnp.einsum("bhwkc,kco->bhwo", stacked, weights)
    if bias is not None:
        out = out + bias
    return out


class DCN(nn.Module):
    """Modulated deformable conv block: internal offset(+mask) conv,
    zero-initialized so it starts as a regular conv (DCNv2 practice).
    `deform_groups` > 1 predicts an independent offset field per input
    channel group (mmcv `deform_groups`, configs/dcn *_group4)."""
    features: int
    kernel_size: int = 3
    modulated: bool = True
    stride: int = 1
    use_bias: bool = True
    deform_groups: int = 1

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size ** 2
        g = self.deform_groups
        off_ch = g * (2 * K + (K if self.modulated else 0))
        off = nn.Conv(off_ch, (self.kernel_size, self.kernel_size),
                      strides=(self.stride, self.stride), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="conv_offset")(x)
        offsets = off[..., :g * 2 * K]
        mod = off[..., g * 2 * K:] if self.modulated else None
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (K, C, self.features))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None
        if g == 1:
            return deform_conv2d(x, offsets, w, b, self.kernel_size,
                                 modulation=mod, stride=self.stride)
        cg = C // g
        out = None
        for i in range(g):
            y = deform_conv2d(
                x[..., i * cg:(i + 1) * cg],
                offsets[..., i * 2 * K:(i + 1) * 2 * K],
                w[:, i * cg:(i + 1) * cg], None, self.kernel_size,
                modulation=(mod[..., i * K:(i + 1) * K]
                            if mod is not None else None),
                stride=self.stride)
            out = y if out is None else out + y
        if b is not None:
            out = out + b
        return out


class ContextBlock(nn.Module):
    """GCNet global-context block (`mmcv.cnn.ContextBlock`, configs/gcnet):
    global attention pooling -> 1x1 bottleneck transform (LN + ReLU) ->
    broadcast add."""
    in_channels: int
    ratio: float = 1.0 / 16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        attn = nn.Conv(1, (1, 1), name="conv_mask")(x).reshape(B, H * W, 1)
        attn = jax.nn.softmax(attn, axis=1)
        ctx = jnp.einsum("bnc,bno->boc", x.reshape(B, H * W, C), attn)
        planes = max(int(self.in_channels * self.ratio), 1)
        t = nn.Dense(planes, name="channel_add_conv_0")(ctx)
        t = nn.relu(nn.LayerNorm(name="channel_add_ln")(t))
        t = nn.Dense(C, kernel_init=nn.initializers.zeros,
                     name="channel_add_conv_1")(t)
        return x + t[:, None]


class SAC(nn.Module):
    """Switchable Atrous Convolution (DetectoRS `detectors_resnet.py` SAC):
    the same kernel evaluated at dilation 1 and 3, blended per-position by a
    learned switch; the dilated path adds a small delta kernel."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.he_normal(),
                       (k, k, C, self.features))
        dw = self.param("delta_kernel", nn.initializers.zeros,
                        (k, k, C, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        switch = nn.Conv(1, (1, 1), kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="switch")(
            jnp.mean(x, axis=(1, 2), keepdims=True))
        s = jax.nn.sigmoid(switch)
        dn = ("NHWC", "HWIO", "NHWC")
        y1 = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                          dimension_numbers=dn)
        y3 = jax.lax.conv_general_dilated(x, w + dw, (1, 1),
                                          [(3, 3), (3, 3)],
                                          rhs_dilation=(3, 3),
                                          dimension_numbers=dn)
        return s * y1 + (1 - s) * y3 + b
