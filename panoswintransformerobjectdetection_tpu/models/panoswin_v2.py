"""PanoSwin v-variant — the backbone the reference detection configs
actually instantiate (`mmdet/models/backbones/panoswin_transformer.py`,
wired by `configs/_base_/models/faster_rcnn_panoswin_fpn.py:5`).

Differences from the "simple" variant (models/panoswin.py):

- per-image partial-pano support: `pano_ratio_v = (v01_start, v01_end,
  ori_h)` drives a per-token latitude map `v` threaded through the stages
  (avg-pool downsampled, `BasicLayer.v_downsample:668`); uv is rebuilt per
  block from v (`make_uv:466`) with u = col * gap, gap = |v[1,0]-v[0,0]|.
- attention bias is the PRODUCT form with a hemisphere blend
  (`WindowAttention._sphere_distance:159`): for t in {idx, idx^T},
  P_t = hav(uv,uv) * alpha[t] * beta[t]; the window's center-token
  `right_u` flag blends P_0 / P_1; the result is added via the reference's
  literal `.transpose(1,3)` (which swaps the q/k axes — reproduced
  verbatim for checkpoint parity).
- planar blocks keep a Swin mask whose region ids are seam-stitched when
  the pano wraps (`BasicLayer._pano_update:644` + `stb_adj_info`).
- `WindowTransition` (`:357`) appends the `right_u` hemisphere-flag
  channel; with shift 0 there is NO spatial transform (unlike the simple
  variant's unconditional ew2ns).
- `PatchEmbed` (`:782`): fixed 3->32->64->embed conv stem ('cnn') or a
  per-patch `PixelTransformer` ('tf'); optional basketball `correct_center`
  pre-warp.
- ape uses `coord_encoder = Linear(3, C)` on xyz only (`:984,1043-1066`).

Layout here is NHWC with v carried as a side-band (B, H, W) map (batched —
it depends on per-image ratios, unlike the simple variant's shared grid).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..geometry.sphere import haversine
from ..ops.windows import (
    window_partition, window_reverse, make_relative_position_index,
    swin_attention_mask, table_lookup,
)
from ..geometry.axis import ew2ns, ns2we
from .layers import Mlp, DropPath, layer_norm, trunc_init, resolve_dtype
from .registry import BACKBONES

PI = math.pi


def patch_v_map(H: int, W: int, ratio_v0, ratio_v1, ori_h, patch: int):
    """Per-token latitude map (`get_v_all_patches:53`), traced per image:
    gap_uv = patch / ori_h * pi * (v1 - v0); v[i] = (i + 0.5) * gap_uv +
    (v0 - 0.5) * pi.  Returns (H, W)."""
    gap = patch / ori_h * PI * (ratio_v1 - ratio_v0)
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) * gap + (ratio_v0 - 0.5) * PI
    return jnp.broadcast_to(v[:, None], (H, W))


def make_uv_from_v(v: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) latitudes -> (B, H, W, 2) uv (`make_uv:466`):
    gap = |v[:,1,0] - v[:,0,0]|; u = col * gap."""
    B, H, W = v.shape
    gap = jnp.abs(v[:, 1, 0] - v[:, 0, 0])
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :] * gap[:, None, None]
    u = jnp.broadcast_to(u, (B, H, W))
    return jnp.stack([u, v], axis=-1)


def right_u_flag(H: int, W: int) -> jnp.ndarray:
    """(H, W) hemisphere flag (`_get_right_u:403`): left-half columns = 1."""
    f = jnp.zeros((H, W), jnp.float32)
    return f.at[:, :(W + 1) // 2].set(1.0)


def pano_transition_v2(xu, shift, reverse=False):
    """`WindowTransition.forward:410` win_trans_type=1 spatial part
    (the right_u append happens in the caller).  xu: (B, H, W, C)."""
    if not reverse:
        xu = jnp.roll(xu, shift, axis=2)
        if xu.shape[2] % 2:
            xu = jnp.pad(xu, ((0, 0), (0, 0), (0, 1), (0, 0)))
            # the reference tracks this pad in `ew2ns_ch` and removes it in
            # ns2we; shapes are static here so the caller crops
        xu = ew2ns(xu)
        xu = jnp.roll(xu, shift, axis=1)
        return xu
    xu = jnp.roll(xu, -shift, axis=1)
    if xu.shape[1] % 2:
        xu = jnp.pad(xu, ((0, 0), (0, 1), (0, 0), (0, 0)))
    xu = ns2we(xu)
    xu = jnp.roll(xu, -shift, axis=2)
    return xu


class WindowAttentionV2(nn.Module):
    """`WindowAttention:87` — Swin bias table + product-form sphere bias."""
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

    def _sphere_bias(self, uvr):
        """uvr: (n, O, 3) -> (n, heads, O, O) (`_sphere_distance:159`,
        including the verbatim transpose(1,3))."""
        uv = uvr[..., :2]
        right = uvr[:, uvr.shape[1] // 2, 2]          # (n,)
        hav = haversine(uv, uv)                        # (n, O, O)
        outs = []
        for idx in (self.rel_index, np.ascontiguousarray(self.rel_index.T)):
            a = table_lookup(self.alpha_table, idx)    # (O, O, h)
            b = table_lookup(self.beta_table, idx)
            outs.append(hav[..., None] * a[None] * b[None])
        blend = right[:, None, None, None] * outs[0] + \
            (1 - right[:, None, None, None]) * outs[1]  # (n, Oq, Ok, h)
        return jnp.swapaxes(blend, 1, 3)               # (n, h, Ok, Oq) — sic

    def __call__(self, x_windows, uvr_windows=None, mask=None):
        """x: (B*nW, O, c); uvr: (B*nW, O, 3) or None (planar);
        mask: (B, nW, O, O) or None."""
        n, O, c = x_windows.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd ** -0.5
        qkv = self.qkv(x_windows).reshape(n, O, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        if uvr_windows is None:
            rel = table_lookup(self.relative_position_bias_table,
                               self.rel_index)
            attn = attn + rel.transpose(2, 0, 1)[None].astype(attn.dtype)
        else:
            attn = attn + self._sphere_bias(uvr_windows).astype(attn.dtype)
        if mask is not None:
            B, nW = mask.shape[:2]
            attn = attn.reshape(B, nW, h, O, O) + mask[:, :, None].astype(attn.dtype)
            attn = attn.reshape(n, h, O, O)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(n, O, c)
        return self.proj(out)


class PanoSwinBlockV2(nn.Module):
    """`PanoSwinTransformerBlock:440`."""
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
        uv = make_uv_from_v(v)                        # (B, H, W, 2)
        attn_mod = WindowAttentionV2(self.dim, ws, self.num_heads,
                                     self.qkv_bias, self.qk_scale,
                                     dtype=self.dtype, name="attn")

        def run_attn(xp, uvrp, m):
            Hp, Wp = xp.shape[1], xp.shape[2]
            wins = window_partition(xp, ws).reshape(-1, ws * ws, c)
            uvr = window_partition(uvrp, ws).reshape(-1, ws * ws, uvrp.shape[-1]) \
                if uvrp is not None else None
            out = attn_mod(wins, uvr, m)
            return window_reverse(out.reshape(-1, ws, ws, c), ws, Hp, Wp)

        if self.win_trans_type == 0:
            # planar layout: pad -> roll -> masked attention -> unroll -> crop.
            # NOTE the v-variant still computes the SPHERE bias here (its
            # attention falls back to the Swin table only when uv is absent,
            # which never happens in the live path).  Reference quirk
            # reproduced: with shift 0 the transition appends the right_u
            # flag; with shift > 0 it does NOT (`forward:410-417`), so the
            # blend weight read from channel -1 is then the V COORDINATE.
            ph, pw = (-H) % ws, (-W) % ws
            xp = jnp.pad(xn, ((0, 0), (0, ph), (0, pw), (0, 0)))
            uvp = jnp.pad(uv, ((0, 0), (0, ph), (0, pw), (0, 0)))
            if self.shift_size > 0:
                uvrp = jnp.concatenate([uvp, uvp[..., 1:2]], -1)  # quirk
            else:
                r = jnp.broadcast_to(
                    right_u_flag(*xp.shape[1:3])[None, ..., None],
                    (B,) + xp.shape[1:3] + (1,))
                uvrp = jnp.concatenate([uvp, r], -1)
            m = mask if self.shift_size > 0 else None
            if self.shift_size > 0:
                xp = jnp.roll(xp, (-self.shift_size, -self.shift_size), (1, 2))
                uvrp = jnp.roll(uvrp, (-self.shift_size, -self.shift_size), (1, 2))
            y = run_attn(xp, uvrp, m)
            if self.shift_size > 0:
                y = jnp.roll(y, (self.shift_size, self.shift_size), (1, 2))
            y = y[:, :H, :W]
        else:
            # pano: transition (roll -> +right_u -> ew2ns -> roll) BEFORE pad
            r = jnp.broadcast_to(right_u_flag(H, W)[None, ..., None],
                                 (B, H, W, 1))
            if self.shift_size > 0:
                # `forward:410`: roll W -> +right_u -> ew2ns -> roll H
                xs = jnp.roll(xn, self.shift_size, axis=2)
                us = jnp.roll(uv, self.shift_size, axis=2)
                xu = jnp.concatenate([xs, us, r], -1)   # flag added post-roll
                if xu.shape[2] % 2:
                    xu = jnp.pad(xu, ((0, 0), (0, 0), (0, 1), (0, 0)))
                xu = ew2ns(xu)
                xu = jnp.roll(xu, self.shift_size, axis=1)
            else:
                xu = jnp.concatenate([xn, uv, r], -1)   # no spatial transform
            SH, SW = xu.shape[1], xu.shape[2]
            ph, pw = (-SH) % ws, (-SW) % ws
            xu = jnp.pad(xu, ((0, 0), (0, ph), (0, pw), (0, 0)))
            y = run_attn(xu[..., :c], xu[..., c:], None)
            y = y[:, :SH, :SW]
            if self.shift_size > 0:
                W_even_pad = W % 2 == 1
                y = pano_transition_v2(y, self.shift_size, reverse=True)
                if W_even_pad:
                    y = y[:, :, :W]
            y = y[:, :H, :W]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
                layer_norm("norm2")(x), deterministic), deterministic)
        return x


def seam_stitched_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """Swin mask whose first-row region ids are replaced by the last-row
    ids (`_pano_update:644` side-adjacency stitch).  Static numpy."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    first = np.unique(img[0])
    last = np.unique(img[-1])
    stitched = img.copy()
    for k, vv in zip(first, last):
        stitched[img == k] = vv
    m = stitched.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class PixelTransformerV2(nn.Module):
    """`PixelTransformer:739` — per-patch 1-layer transformer embed
    (`emb_conv_type='tf'`), exact torch-1.6 semantics:

    - `process_x:758` decomposes H as `(p1 w)` / W as `(p2 h)` with the
      patch index OUTER — patch "pixels" are strided by the patch count,
      not contiguous 4x4 blocks.  A reference quirk, reproduced verbatim
      for checkpoint parity.
    - Linear(c -> d) `preprocess_nouv` + learned pos_embedding, then ONE
      post-norm `nn.TransformerEncoderLayer` (nhead=8, ffn=d, relu,
      dropout inert at inference), then SUM over the p*p sequence
      (`forward:766-770`, uv_mask=None — the only path `PatchEmbed.forward`
      reaches, `:851 self.proj(x)`).
    """
    embed_dim: int = 96
    patch_size: int = 4
    num_heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p, d, nh = self.patch_size, self.embed_dim, self.num_heads
        dt = resolve_dtype(self.dtype)
        B, H, W, C = x.shape
        nH, nW = H // p, W // p
        # '(p1 w) (p2 h)' with p1/p2 outer (strided patch decomposition)
        x = x.reshape(B, p, nH, p, nW, C)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B * nH * nW, p * p, C)
        x = nn.Dense(d, dtype=dt, name="preprocess_nouv")(x)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, p * p, d))
        x = x + pos.astype(x.dtype)
        # torch TransformerEncoderLayer (post-norm): MHA + residual + LN,
        # then linear->relu->linear + residual + LN
        qkv_w = self.param("in_proj_weight",
                           nn.initializers.xavier_uniform(), (3 * d, d))
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = x @ qkv_w.T.astype(x.dtype) + qkv_b.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // nh
        N = x.shape[0]
        q = q.reshape(N, p * p, nh, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(N, p * p, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(N, p * p, nh, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)
                               ).astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(N, p * p, d)
        o = nn.Dense(d, dtype=dt, name="out_proj")(o)
        x = layer_norm("norm1")(x + o)
        f = nn.Dense(d, dtype=dt, name="linear1")(x)
        f = nn.Dense(d, dtype=dt, name="linear2")(nn.relu(f))
        x = layer_norm("norm2")(x + f)
        x = x.sum(axis=1)                       # `forward:770` seq-sum pool
        return x.reshape(B, nH, nW, d)


class PatchEmbedV2(nn.Module):
    """`PatchEmbed:782` — 'cnn': 3x3(32)+BN+ReLU -> 3x3(64)+BN+ReLU ->
    patch-stride conv(embed); 'tf': `PixelTransformerV2`.  Optional
    basketball `correct_center` latitude pre-warp (`:842-851`, per image
    with gap_uv against the original height `pano_ratio_v[:,2]`)."""
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True
    emb_conv_type: str = "cnn"
    basketball_trans: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pano_ratio_v=None, train: bool = False):
        ps = self.patch_size
        dt = resolve_dtype(self.dtype)
        if dt is not None:
            x = x.astype(dt)
        B, H, W, _ = x.shape
        if W % ps:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ps - W % ps), (0, 0)))
        if H % ps:
            x = jnp.pad(x, ((0, 0), (0, ps - H % ps), (0, 0), (0, 0)))
        if self.basketball_trans:
            if pano_ratio_v is None:
                pano_ratio_v = jnp.tile(
                    jnp.array([[0.0, 1.0, float(H)]], jnp.float32), (B, 1))
            from ..geometry.basketball import correct_center_traced
            x = jax.vmap(lambda im, pr: correct_center_traced(
                im, ps, pr[0], pr[1], pr[2]))(x, pano_ratio_v)
        if self.emb_conv_type == "tf":
            x = PixelTransformerV2(self.embed_dim, ps, dtype=dt,
                                   name="proj")(x)
        else:
            x = nn.Conv(32, (3, 3), padding=1, dtype=dt, name="conv0")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn0")(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 3), padding=1, dtype=dt, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), dtype=dt,
                        name="proj")(x)
        if self.use_norm:
            x = layer_norm("norm")(x)
        if dt is not None:
            x = x.astype(dt)
        return x


@BACKBONES.register
class PanoSwinTransformerV2(nn.Module):
    """`PanoSwinTransformer:868` (v-variant)."""
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
    emb_conv_type: str = "cnn"
    basketball_trans: bool = False
    use_checkpoint: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, images, pano_ratio_v=None, train: bool = False):
        """images: (B, H, W, 3); pano_ratio_v: (B, 3) = (v0, v1, ori_h)
        per image (defaults to full pano with ori_h = H)."""
        deterministic = not train
        B, H0, W0, _ = images.shape
        if pano_ratio_v is None:
            pano_ratio_v = jnp.tile(
                jnp.array([[0.0, 1.0, float(H0)]], jnp.float32), (B, 1))

        x = PatchEmbedV2(self.patch_size, self.embed_dim,
                         use_norm=self.patch_norm,
                         emb_conv_type=self.emb_conv_type,
                         basketball_trans=self.basketball_trans,
                         dtype=self.dtype,
                         name="patch_embed")(images, pano_ratio_v,
                                             train=train)
        B, H, W, C = x.shape

        def vmap_v(pr):
            return patch_v_map(H, W, pr[0], pr[1], pr[2], self.patch_size)
        v = jax.vmap(vmap_v)(pano_ratio_v)             # (B, H, W)

        if self.ape:
            # `_pano_abs_position:1043`: the ape latitude map uses patch
            # size 1 (NOT the embed patch size) over the post-embed grid
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
            # per-image side adjacency (`stb_adj_info:37`): the pano wraps
            # when U_LEN + gap/2 > 2pi with gap = patch/ori_h*pi*(v1-v0)
            gap = self.patch_size / pano_ratio_v[:, 2] * PI * \
                (pano_ratio_v[:, 1] - pano_ratio_v[:, 0])
            u_len = (W0 / self.patch_size) * gap
            side = u_len + 0.5 * gap > 2 * PI
            mask = jnp.where(side[:, None, None, None],
                             jnp.asarray(stitched)[None],
                             jnp.asarray(base)[None])   # (B, nW, O, O)
            for d in range(self.depths[i]):
                x = PanoSwinBlockV2(
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
                # v_downsample: edge-replicate odd dims then 2x2 avg-pool
                if H % 2:
                    v = jnp.concatenate([v, v[:, -1:]], 1)
                if W % 2:
                    v = jnp.concatenate([v, v[:, :, -1:]], 2)
                v = (v[:, 0::2, 0::2] + v[:, 1::2, 0::2] +
                     v[:, 0::2, 1::2] + v[:, 1::2, 1::2]) * 0.25
                H, W = x.shape[1], x.shape[2]
        return tuple(outs)
