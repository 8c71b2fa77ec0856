"""PanoSwin v1 — the reference's kept-around prior revision
(`mmdet/models/backbones/panoswin_transformer_v1.py`, unregistered dead
code upstream; rebuilt here for inventory completeness).

Differences from the v-variant (models/panoswin_v2.py, which mirrors the
reference's final `panoswin_transformer.py`):

- the latitude side-band is a SINGLE channel `v` appended after the
  window-multiple pad (`forward:404-408`, edge-replicated into the pad),
  not the uv pair; u is reconstructed inside the attention from the
  flattened window (`_sphere_distance:160-168`): gap = |v[ws]-v[ws-1]|,
  u = (col index) * gap.
- the sphere bias is the single product form hav * alpha * beta with the
  literal `.transpose(1,3)` (`_sphere_distance:178-182`) — there is no
  hemisphere right_u blend, and in pano mode it REPLACES the relative
  position bias (`forward:240-244`) instead of adding to it.
- `WindowTransition` (`:262`) never appends a flag channel; with shift 0
  it is the identity for both win_trans_types.
- shifted blocks pass the BasicLayer Swin mask regardless of
  win_trans_type (`forward:414-417`) — in pano mode the mask windows pair
  with transitioned windows in scrambled order; reference behavior is
  reproduced verbatim.
- the pad to window multiples happens BEFORE the pano transition
  (`forward:395-400`), the exact opposite of the v-variant's order.

Everything else (patch embed stem, ape xyz coord encoder, seam-stitched
masks via stb_adj, v avg-pool downsampling, patch merging) matches the
v-variant and is reused from models/panoswin_v2.py.
"""

import math
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..geometry.sphere import haversine
from ..geometry.axis import ew2ns, ns2we
from ..ops.windows import (
    window_partition, window_reverse, make_relative_position_index,
    swin_attention_mask, table_lookup,
)
from .layers import Mlp, DropPath, layer_norm, trunc_init, resolve_dtype
from .panoswin_v2 import (
    PatchEmbedV2, patch_v_map, make_uv_from_v, seam_stitched_mask,
)
from .registry import BACKBONES

PI = math.pi


class WindowAttentionV1(nn.Module):
    """`WindowAttention:99` — Swin bias table + v-only sphere bias."""
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = None

    def setup(self):
        dt = resolve_dtype(self.dtype)
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                            kernel_init=trunc_init, dtype=dt, name="qkv")
        self.proj = nn.Dense(self.dim, kernel_init=trunc_init, dtype=dt,
                             name="proj")
        t = (2 * self.window_size - 1) ** 2
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table", trunc_init, (t, self.num_heads))
        self.alpha_table = self.param("alpha_table", trunc_init,
                                      (t, self.num_heads))
        self.beta_table = self.param("beta_table", trunc_init,
                                     (t, self.num_heads))
        self.rel_index = make_relative_position_index(self.window_size)

    def _sphere_bias(self, v_win):
        """v_win: (n, O) -> (n, heads, O, O) (`_sphere_distance:159`):
        u rebuilt from the window column index scaled by the row gap
        |v[ws] - v[ws-1]|; single product bias, verbatim transpose(1,3)."""
        ws = self.window_size
        gap = jnp.abs(v_win[:, ws] - v_win[:, ws - 1])            # (n,)
        col = jnp.tile(jnp.arange(ws, dtype=v_win.dtype), ws)     # (O,)
        u = col[None, :] * gap[:, None]                           # (n, O)
        uv = jnp.stack([u, v_win], -1)                            # (n, O, 2)
        hav = haversine(uv, uv)                                   # (n, O, O)
        a = table_lookup(self.alpha_table, self.rel_index)        # (O, O, h)
        b = table_lookup(self.beta_table, self.rel_index)
        sp = hav[..., None] * a[None] * b[None]                   # (n,Oq,Ok,h)
        return jnp.swapaxes(sp, 1, 3)                             # (n,h,Ok,Oq)

    def __call__(self, x_windows, v_windows=None, mask=None):
        """x: (B*nW, O, c); v: (B*nW, O) or None; mask: (B, nW, O, O)."""
        n, O, c = x_windows.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd ** -0.5
        qkv = self.qkv(x_windows).reshape(n, O, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        if v_windows is None:
            rel = table_lookup(self.relative_position_bias_table,
                               self.rel_index)
            attn = attn + rel.transpose(2, 0, 1)[None].astype(attn.dtype)
        else:
            # pano mode: sphere bias REPLACES the relative bias
            # (`forward:240-244`)
            attn = attn + self._sphere_bias(v_windows).astype(attn.dtype)
        if mask is not None:
            B, nW = mask.shape[:2]
            attn = attn.reshape(B, nW, h, O, O) + mask[:, :, None].astype(attn.dtype)
            attn = attn.reshape(n, h, O, O)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(n, O, c)
        return self.proj(out)


class PanoSwinBlockV1(nn.Module):
    """`SwinTransformerBlock:330` (v1 revision)."""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    win_trans_type: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, v, mask=None, deterministic=True):
        """x: (B, H, W, c); v: (B, H, W) latitudes; mask: (B, nW, O, O)."""
        B, H, W, c = x.shape
        ws = self.window_size
        dt = resolve_dtype(self.dtype)
        shortcut = x
        xn = layer_norm("norm1")(x)
        if dt is not None:
            xn = xn.astype(dt)
        attn_mod = WindowAttentionV1(self.dim, ws, self.num_heads,
                                     self.qkv_bias, self.qk_scale,
                                     dtype=self.dtype, name="attn")

        # pad to window multiples FIRST (`forward:395-400`); v is
        # edge-replicated into the pad (`forward:404-407`)
        ph, pw = (-H) % ws, (-W) % ws
        xp = jnp.pad(xn, ((0, 0), (0, ph), (0, pw), (0, 0)))
        vp = v
        if ph:
            vp = jnp.concatenate([vp, jnp.repeat(vp[:, -1:], ph, 1)], 1)
        if pw:
            vp = jnp.concatenate([vp, jnp.repeat(vp[:, :, -1:], pw, 2)], 2)
        xv = jnp.concatenate([xp, vp[..., None].astype(xp.dtype)], -1)

        # transition (`WindowTransition.forward:288`): no flag channel
        if self.shift_size > 0:
            if self.win_trans_type == 0:
                xv = jnp.roll(xv, (-self.shift_size, -self.shift_size), (1, 2))
            else:
                xv = jnp.roll(xv, self.shift_size, axis=2)
                if xv.shape[2] % 2:
                    xv = jnp.pad(xv, ((0, 0), (0, 0), (0, 1), (0, 0)))
                xv = ew2ns(xv)
                xv = jnp.roll(xv, self.shift_size, axis=1)
        SH, SW = xv.shape[1], xv.shape[2]

        # shifted blocks always get the BasicLayer mask (`forward:414-417`),
        # pano included; drop it only when the transitioned window count
        # can't pair with it (a geometry the reference would crash on)
        m = mask if self.shift_size > 0 else None
        eh, ew = (-SH) % ws, (-SW) % ws
        xv = jnp.pad(xv, ((0, 0), (0, eh), (0, ew), (0, 0)))
        Hq, Wq = xv.shape[1], xv.shape[2]
        nW = (Hq // ws) * (Wq // ws)
        if m is not None and m.shape[1] != nW:
            m = None
        wins = window_partition(xv, ws).reshape(-1, ws * ws, c + 1)
        out = attn_mod(wins[..., :-1], wins[..., -1], m)
        y = window_reverse(out.reshape(-1, ws, ws, c), ws, Hq, Wq)
        y = y[:, :SH, :SW]

        # reverse transition, then crop (`forward:442-445`)
        if self.shift_size > 0:
            if self.win_trans_type == 0:
                y = jnp.roll(y, (self.shift_size, self.shift_size), (1, 2))
            else:
                y = jnp.roll(y, -self.shift_size, axis=1)
                if y.shape[1] % 2:
                    y = jnp.pad(y, ((0, 0), (0, 1), (0, 0), (0, 0)))
                y = ns2we(y)
                y = jnp.roll(y, -self.shift_size, axis=2)
        y = y[:, :H, :W]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
                layer_norm("norm2")(x), deterministic), deterministic)
        return x


@BACKBONES.register
class PanoSwinTransformerV1(nn.Module):
    """`PanoSwinTransformer:820` (v1 revision).  Stage/mask/v threading is
    identical to the v-variant (`BasicLayer.forward:602-668` matches);
    only the block and attention differ."""
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
    win_trans_type: int = 1
    use_checkpoint: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, images, pano_ratio_v=None, train: bool = False):
        """images: (B, H, W, 3); pano_ratio_v: (B, 3) = (v0, v1, ori_h)."""
        deterministic = not train
        B, H0, W0, _ = images.shape
        if pano_ratio_v is None:
            pano_ratio_v = jnp.tile(
                jnp.array([[0.0, 1.0, float(H0)]], jnp.float32), (B, 1))

        x = PatchEmbedV2(self.patch_size, self.embed_dim,
                         use_norm=self.patch_norm, dtype=self.dtype,
                         name="patch_embed")(images, train=train)
        B, H, W, C = x.shape

        def vmap_v(pr):
            return patch_v_map(H, W, pr[0], pr[1], pr[2], self.patch_size)
        v = jax.vmap(vmap_v)(pano_ratio_v)             # (B, H, W)

        if self.ape:
            def vmap_v1(pr):
                return patch_v_map(H, W, pr[0], pr[1], pr[2], 1)
            v_ape = jax.vmap(vmap_v1)(pano_ratio_v)
            uv = make_uv_from_v(v_ape)
            u_, v_ = uv[..., 0], uv[..., 1]
            xyz = jnp.stack([jnp.sin(u_) * jnp.sin(v_),
                             jnp.cos(u_) * jnp.sin(v_),
                             jnp.cos(v_)], -1)          # `_pano_abs_position`
            x = x + nn.Dense(self.embed_dim, kernel_init=trunc_init,
                             name="coord_encoder")(xyz)

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = []
        for i in range(num_layers):
            dim_i = int(self.embed_dim * 2 ** i)
            start = sum(self.depths[:i])
            ws = self.window_size
            shift = ws // 2
            Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
            base = swin_attention_mask(Hp, Wp, ws, shift)
            stitched = seam_stitched_mask(Hp, Wp, ws, shift)
            gap = self.patch_size / pano_ratio_v[:, 2] * PI * \
                (pano_ratio_v[:, 1] - pano_ratio_v[:, 0])
            u_len = (W0 / self.patch_size) * gap
            side = u_len + 0.5 * gap > 2 * PI
            mask = jnp.where(side[:, None, None, None],
                             jnp.asarray(stitched)[None],
                             jnp.asarray(base)[None])   # (B, nW, O, O)
            for d in range(self.depths[i]):
                x = PanoSwinBlockV1(
                    dim=dim_i, num_heads=self.num_heads[i], window_size=ws,
                    shift_size=0 if d % 2 == 0 else shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop_path=dpr[start + d],
                    win_trans_type=self.win_trans_type, dtype=self.dtype,
                    name=f"layers_{i}_blocks_{d}")(x, v, mask, deterministic)
            if i in self.out_indices:
                outs.append(layer_norm(f"norm{i}")(x.astype(jnp.float32)))
            if i < num_layers - 1:
                from .layers import PatchMerging
                x = PatchMerging(dtype=self.dtype,
                                 name=f"layers_{i}_downsample")(x)
                if H % 2:
                    v = jnp.concatenate([v, v[:, -1:]], 1)
                if W % 2:
                    v = jnp.concatenate([v, v[:, :, -1:]], 2)
                v = (v[:, 0::2, 0::2] + v[:, 1::2, 0::2] +
                     v[:, 0::2, 1::2] + v[:, 1::2, 1::2]) * 0.25
                H, W = x.shape[1], x.shape[2]
        return tuple(outs)
