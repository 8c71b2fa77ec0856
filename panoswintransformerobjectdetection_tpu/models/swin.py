"""Stock Swin Transformer backbone (planar) — COCO model-zoo coverage.

Re-implementation of the reference's `mmdet/models/backbones/swin_transformer.py`
semantics in flax/NHWC: single-conv patch embed, single relative-position
bias table per block, cyclic shift + 9-region mask, PatchMerging.  Exactly
reproduces stock Swin so converted COCO checkpoints (Swin-T/S/B Mask/Cascade
R-CNN) yield identical features.
"""

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.windows import (
    window_partition, window_reverse, make_relative_position_index,
    swin_attention_mask, table_lookup,
)
from .layers import (Mlp, DropPath, SingleConvPatchEmbed, PatchMerging,
                     layer_norm, trunc_init, resolve_dtype)
from .registry import BACKBONES


class SwinWindowAttention(nn.Module):
    """W-MSA with a single learned relative position bias table."""
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x_windows, mask=None):
        dt = resolve_dtype(self.dtype)
        n, O, c = x_windows.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd ** -0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=trunc_init,
                       dtype=dt, name="qkv")(x_windows)
        qkv = qkv.reshape(n, O, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        t = (2 * self.window_size - 1) ** 2
        table = self.param("relative_position_bias_table", trunc_init, (t, h))
        rel_index = make_relative_position_index(self.window_size)
        bias = table_lookup(table, rel_index).transpose(2, 0, 1)[None]  # (1, h, O, O)

        attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias.astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(n // nW, nW, h, O, O) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(n, h, O, O)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(n, O, c)
        return nn.Dense(c, kernel_init=trunc_init, dtype=dt, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, H, W, c = x.shape
        ws = self.window_size
        dt = resolve_dtype(self.dtype)
        shortcut = x
        xn = layer_norm("norm1")(x)
        if dt is not None:
            xn = xn.astype(dt)
        ph, pw = (-H) % ws, (-W) % ws
        if ph or pw:
            xn = jnp.pad(xn, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        if self.shift_size > 0:
            xn = jnp.roll(xn, shift=(-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = jnp.asarray(swin_attention_mask(Hp, Wp, ws, self.shift_size))
        else:
            mask = None
        wins = window_partition(xn, ws).reshape(-1, ws * ws, c)
        attn = SwinWindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                                   self.qk_scale, dtype=self.dtype,
                                   name="attn")(wins, mask)
        y = window_reverse(attn.reshape(-1, ws, ws, c), ws, Hp, Wp)
        if self.shift_size > 0:
            y = jnp.roll(y, shift=(self.shift_size, self.shift_size), axis=(1, 2))
        y = y[:, :H, :W, :]
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
                layer_norm("norm2")(x), deterministic), deterministic)
        return x


@BACKBONES.register
class SwinTransformer(nn.Module):
    """Swin-T/S/B/L backbone; returns NHWC maps per out_index."""
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.2
    ape: bool = False
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    pretrain_img_size: int = 224
    use_checkpoint: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        deterministic = not train
        x = SingleConvPatchEmbed(self.patch_size, self.embed_dim,
                                 use_norm=self.patch_norm, dtype=self.dtype,
                                 name="patch_embed")(images, train=train)
        B, H, W, C = x.shape
        if self.ape:
            ps = self.pretrain_img_size // self.patch_size
            ape = self.param("absolute_pos_embed", trunc_init, (1, ps, ps, C))
            # torch-exact bicubic (A=-0.75): the reference interpolates the
            # pretrain-resolution table at forward (`swin_transformer.py:449`)
            from ..geometry.resample import interpolate_bicubic
            x = x + interpolate_bicubic(ape, H, W).astype(x.dtype)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = []
        num_layers = len(self.depths)
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if self.use_checkpoint else SwinBlock)
        for i in range(num_layers):
            dim_i = int(self.embed_dim * 2 ** i)
            for d in range(self.depths[i]):
                x = block_cls(
                    dim=dim_i, num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop_path=dpr[sum(self.depths[:i]) + d],
                    dtype=self.dtype,
                    name=f"layers_{i}_blocks_{d}")(x, deterministic)
            if i in self.out_indices:
                outs.append(layer_norm(f"norm{i}")(x.astype(jnp.float32)))
            if i < num_layers - 1:
                x = PatchMerging(dtype=self.dtype, name=f"layers_{i}_downsample")(x)
        return tuple(outs)
