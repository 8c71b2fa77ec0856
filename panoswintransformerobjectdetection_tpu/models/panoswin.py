"""PanoSwin Transformer backbone — TPU-native flax implementation.

Re-design of the reference PanoSwin (CVPR'23), primary source
`mmdet/models/backbones/simple_panoswin_transformer.py` (the file the
reference README points at).  Key departures from the torch code:

- uv coordinates are SIDE-BAND data `(x, uv)` threaded through calls, not
  two extra feature channels (the reference's C = c+2 concat,
  `simple_panoswin_transformer.py:964`, exists only because nn.Module
  signatures are rigid).
- layout is NHWC end-to-end (TPU conv/attention native layout); tokens stay
  (B, H, W, C) between blocks — reshape to windows happens only around the
  attention op.
- all shapes are static under jit; the planar attention mask and relative
  position indices are built in numpy at trace time and baked as constants.
- pano-shift (`WindowTransition:326`) = roll/flip/concat layout ops.
- attention itself can run through the fused Pallas kernel (ops/attention)
  or the XLA einsum path.

Modes: `pano_mode=True` gives great-circle position bias (haversine * alpha
table + beta table) and pano-shift; `pano_mode=False` reproduces planar
Swin semantics (beta table only, cyclic shift, 9-region mask).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..geometry.sphere import make_uv_grid, haversine
from ..geometry.rotate import pano_rotate, pano_rotate_image
from ..geometry.resample import grid_sample_nhwc
from ..ops.windows import (
    window_partition, window_reverse, make_relative_position_index,
    swin_attention_mask, window_transition, window_transition_reverse,
    table_lookup,
)
from .layers import (
    Mlp, DropPath, ConvStemPatchEmbed, PatchMerging, layer_norm, trunc_init,
    resolve_dtype,
)
from .registry import BACKBONES

PI = math.pi


def sphere_bias(alpha_table, beta_table, rel_index, uv1, uv2, pano_mode,
                hav=None):
    """Great-circle attention bias (`BasicWindowAttention._sphere_bias:241`).

    pano:   haversine(uv1, uv2) * alpha[rel] + beta[rel]
    planar: beta[rel]
    alpha/beta_table: (T, heads); rel_index: (O, O) static; uv*: (n, O, 2).
    hav: optional precomputed haversine (n, O, O) — it depends only on the
    uv grid, which is identical for every block of a stage with the same
    shift, so `BasicLayer` computes it once per shift variant instead of
    once per block (`prepare_window_uv`).
    Returns (n, heads, O, O) (or (1, heads, O, O) in planar mode).
    """
    beta = table_lookup(beta_table, rel_index)        # (O, O, heads)
    if pano_mode:
        if hav is None:
            hav = haversine(uv1, uv2)                 # (n, O, O)
        alpha = table_lookup(alpha_table, rel_index)  # (O, O, heads)
        bias = hav[..., None] * alpha[None] + beta[None]
        return bias.transpose(0, 3, 1, 2)
    return beta.transpose(2, 0, 1)[None]


def prepare_window_uv(uv, shift_size, ws, pano_mode):
    """Window the uv side-band for one shift variant and precompute the
    haversine couplings: returns (uv_wins (nW, O, 2), hav (nW, O, O)|None).

    Exactly the uv handling of `PanoSwinBlock.__call__`; hoisted to
    `BasicLayer` so a depth-d stage does this work twice (shift 0 and
    ws//2) instead of d times.
    """
    if pano_mode:
        uvt = window_transition(uv, shift_size, True)
    else:
        uvt = uv
    SH, SW = uvt.shape[0], uvt.shape[1]
    ph, pw = (-SH) % ws, (-SW) % ws
    if ph or pw:
        uvt = jnp.pad(uvt, ((0, ph), (0, pw), (0, 0)))
    if (not pano_mode) and shift_size > 0:
        uvt = window_transition(uvt, shift_size, False)
    uv_wins = window_partition(uvt[None], ws).reshape(-1, ws * ws, 2)
    hav = haversine(uv_wins, uv_wins) if pano_mode else None
    return uv_wins, hav


def _attention_core(q, k, v, bias, mask, scale):
    """(n, heads, O, hd) attention with additive bias/mask, fp32 softmax.

    bias: (nW, heads, O, O) with n = B * nW — batch-independent (the uv
    grid is content-free), broadcast across the batch without
    materializing B copies.
    """
    n, h, O, hd = q.shape
    attn = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    nW = bias.shape[0]
    attn = attn.reshape(n // nW, nW, h, O, O) + bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn + mask[None, :, None].astype(attn.dtype)
    attn = attn.reshape(n, h, O, O)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
    return out


def _attention_core_hip(qkv, bias, mask, scale, h):
    """Head-in-place attention: qkv stays (n, O, 3, h, hd) exactly as the
    fused projection produced it — no (2, 0, 3, 1, 4) transpose.  At
    stage-0 shapes that 5-D transpose relayouts ~75 MB per block and was
    the dominant cost of the attention module (on-chip anatomy: attn 3.2
    ms of a 5.0 ms block while qkv GEMM / bias / softmax each measure
    ~0); dot_general with trailing batch-ish head axes folds the layout
    into the matmuls instead.  bias: (nW, h, O, O) batch-shared;
    returns (n, O, h*hd)."""
    n, O = qkv.shape[0], qkv.shape[1]
    hd = qkv.shape[-1]
    q = qkv[:, :, 0] * scale                             # (n, O, h, hd)
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]
    attn = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                      preferred_element_type=jnp.float32)
    nW = bias.shape[0]
    attn = attn.reshape(n // nW, nW, h, O, O) + bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn + mask[None, :, None].astype(attn.dtype)
    attn = attn.reshape(n, h, O, O)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(v.dtype), v)
    return out.reshape(n, O, h * hd)


class WindowAttention(nn.Module):
    """W-MSA with dual-table spherical relative bias (`WindowAttention:315`)."""
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = None
    fused: bool = False

    def setup(self):
        dt = resolve_dtype(self.dtype)
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                            kernel_init=trunc_init, dtype=dt, name="qkv")
        self.proj = nn.Dense(self.dim, kernel_init=trunc_init, dtype=dt, name="proj")
        t = (2 * self.window_size - 1) ** 2
        self.alpha_table = self.param("alpha_table", trunc_init, (t, self.num_heads))
        self.beta_table = self.param("beta_table", trunc_init, (t, self.num_heads))
        self.rel_index = make_relative_position_index(self.window_size)

    def __call__(self, x_windows, uv_windows, mask=None, pano_mode=True,
                 hav=None):
        """x_windows: (B*nW, O, c); uv_windows: (nW, O, 2) — UNBATCHED (the
        uv grid depends only on the static pano geometry); mask: (nW, O, O);
        hav: optional precomputed haversine(uv, uv) (nW, O, O)."""
        n, O, c = x_windows.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd ** -0.5
        qkv = self.qkv(x_windows).reshape(n, O, 3, h, hd)
        bias = sphere_bias(self.alpha_table, self.beta_table, self.rel_index,
                           uv_windows, uv_windows, pano_mode, hav=hav)
        if not pano_mode:
            bias = jnp.broadcast_to(bias, (uv_windows.shape[0],) + bias.shape[1:])

        if not self.fused:
            return self.proj(_attention_core_hip(qkv, bias, mask, scale, h))

        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        from ..ops.fused_attention import packed_window_attention
        if mask is not None:
            # fold the shifted-window mask into the additive bias so
            # the packed kernel covers planar SW-MSA too
            bias = bias + mask[:, None].astype(bias.dtype)
        Op = -(-O // 8) * 8
        if Op != O:
            padqkv = ((0, 0), (0, 0), (0, Op - O), (0, 0))
            q = jnp.pad(q, padqkv)
            k = jnp.pad(k, padqkv)
            v = jnp.pad(v, padqkv)
            # padded keys must never win the softmax
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Op - O), (0, Op - O)),
                           constant_values=0.0)
            bias = bias.at[..., :, O:].set(-1e9)
        out = packed_window_attention(q, k, v, bias, scale)[:, :, :O]
        out = out.transpose(0, 2, 1, 3).reshape(n, O, c)
        return self.proj(out)


class PanoSwinBlock(nn.Module):
    """One (shifted-)window attention block (`PanoSwinTransformerBlock:412`)."""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x, uv, pano_mode=True, deterministic=True,
                 uv_ctx=None):
        """x: (B, H, W, c); uv: (H, W, 2) UNBATCHED f32 side-band (zeros in
        planar mode) — the sphere bias it induces is shared across the
        batch, so it is computed once per window, not per image.
        uv_ctx: optional (uv_wins, hav) from `prepare_window_uv` — when the
        caller (`BasicLayer`) hoists the per-shift uv windowing + haversine
        out of the per-block path.
        """
        B, H, W, c = x.shape
        ws = self.window_size
        dt = resolve_dtype(self.dtype)
        shortcut = x
        xn = layer_norm("norm1")(x)
        if dt is not None:
            xn = xn.astype(dt)

        # pano mode applies the ew2ns pole rotation on EVERY block — with
        # shift_size=0 the transition is roll(0) -> ew2ns -> roll(0)
        # (`WindowTransition.forward:393-406` is unconditional in the pano
        # branch of `PanoSwinTransformerBlock.forward:507`)
        if pano_mode:
            xn = window_transition(xn, self.shift_size, True)
        SH, SW = xn.shape[1], xn.shape[2]
        ph, pw = (-SH) % ws, (-SW) % ws
        if ph or pw:
            xn = jnp.pad(xn, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if (not pano_mode) and self.shift_size > 0:
            xn = window_transition(xn, self.shift_size, False)
            mask = jnp.asarray(swin_attention_mask(SH + ph, SW + pw, ws, self.shift_size))
        else:
            mask = None
        Hp, Wp = xn.shape[1], xn.shape[2]

        if uv_ctx is None:
            uv_ctx = prepare_window_uv(uv, self.shift_size, ws, pano_mode)
        uv_wins, hav = uv_ctx

        wins = window_partition(xn, ws).reshape(-1, ws * ws, c)
        attn = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                               self.qk_scale, dtype=self.dtype,
                               fused=self.fused, name="attn")(
            wins, uv_wins, mask=mask, pano_mode=pano_mode, hav=hav)
        y = window_reverse(attn.reshape(-1, ws, ws, c), ws, Hp, Wp)

        if (not pano_mode) and self.shift_size > 0:
            y = window_transition_reverse(y, self.shift_size, False)
        y = y[:, :SH, :SW, :]
        if pano_mode:
            y = window_transition_reverse(y, self.shift_size, True, width_was_odd=bool(W % 2))
        y = y[:, :H, :W, :]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
                layer_norm("norm2")(x), deterministic), deterministic)
        return x


class PitchAttention(nn.Module):
    """Cross-window attention against a great-circle-rotated resampling of
    the whole map (`PitchAttentionModule:990`).

    q/v from the original windows, k from the same windows of the rotated
    map; sphere bias couples original and rotated uv.  The reference's
    `with_uv=True` call crashes (`simple_panoswin_transformer.py:1038` —
    `lzx/pano_rotate.py:169` has no such parameter); we implement the
    intended behavior: uv is resampled through the identical grid.
    """
    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    np_v: float = -0.0001

    def setup(self):
        d = self.dim
        self.q_linear = nn.Dense(d, use_bias=self.qkv_bias, kernel_init=trunc_init, name="q_linear")
        self.k_linear = nn.Dense(d, use_bias=self.qkv_bias, kernel_init=trunc_init, name="k_linear")
        self.v_linear = nn.Dense(d, use_bias=self.qkv_bias, kernel_init=trunc_init, name="v_linear")
        self.proj = nn.Dense(d, kernel_init=trunc_init, name="proj")
        t = (2 * self.window_size - 1) ** 2
        self.alpha_table = self.param("alpha_table", trunc_init, (t, self.num_heads))
        self.beta_table = self.param("beta_table", trunc_init, (t, self.num_heads))
        self.rel_index = make_relative_position_index(self.window_size)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), name="mlp")

    def _rotated_windows(self, xu, pad_r, pad_b):
        """Rotate the (feature+uv) map and resample one window per original
        window position (`PitchAttentionModule.get_rotated:1024`)."""
        B, Hp, Wp, C = xu.shape
        ws = self.window_size
        np_uv = jnp.array([1.0 * PI, self.np_v * PI], jnp.float32)

        rot_bchw, _ = pano_rotate_image(jnp.moveaxis(xu, -1, 1), np_uv)
        rotated = jnp.moveaxis(rot_bchw, 1, -1)       # (B, Hp, Wp, C)

        nH, nW = Hp // ws, Wp // ws
        us = ((jnp.arange(nW, dtype=jnp.float32) + 0.5) / nW * 2.0 * (1.0 - pad_r / Wp) - 1.0) * PI
        vs = ((jnp.arange(nH, dtype=jnp.float32) + 0.5) / nH * (1.0 - pad_b / Hp) - 0.5) * PI
        uu = jnp.broadcast_to(us[None, :], (nH, nW))
        vv = jnp.broadcast_to(vs[:, None], (nH, nW))
        centers = jnp.stack([uu, vv], -1).reshape(-1, 2)
        rc = pano_rotate(np_uv, centers).reshape(nH, nW, 2) / PI
        rc = rc.at[..., 1].multiply(-1.0)
        rc = jnp.flip(rc, axis=0)
        rc = rc.at[..., 1].multiply(2.0)

        ar = (jnp.arange(ws, dtype=jnp.float32) + 0.5 - 0.5 * ws) / Hp
        gx = jnp.broadcast_to(ar[:, None], (ws, ws))
        gy = jnp.broadcast_to(ar[None, :], (ws, ws))
        bias = jnp.stack([gx, gy], -1) * 2.0
        bias = bias.at[..., 0].multiply(0.5)
        grids = rc[:, :, None, None, :] + bias[None, None]   # (nH, nW, ws, ws, 2)
        grids = grids.reshape(nH * nW, ws * ws, 2)
        grids = jnp.where(grids <= -1.0, grids + 2.0, grids)
        grids = jnp.where(grids >= 1.0, grids - 2.0, grids)

        g = jnp.broadcast_to(grids[None], (B, nH * nW, ws * ws, 2))
        sampled = grid_sample_nhwc(rotated, g, padding_mode="border",
                                   align_corners=False)     # (B, s, O, C)
        sampled = sampled.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        return sampled.reshape(B, Hp, Wp, C)

    def __call__(self, x, uv, pano_mode=True, deterministic=True):
        """x: (B, H, W, c); uv: (H, W, 2) unbatched f32 side-band."""
        B, H, W, c = x.shape
        ws = self.window_size
        xn = self.norm1(x)
        # NOTE: the reference takes `shortcut_bsc` as a *view* of the input
        # and then overwrites it in place with norm1
        # (`simple_panoswin_transformer.py:1154-1155`), so its residual is
        # the POST-norm features; reproduced for checkpoint parity.
        shortcut = xn
        pad_b, pad_r = (-H) % ws, (-W) % ws
        uvp = uv
        if pad_b or pad_r:
            xn = jnp.pad(xn, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            uvp = jnp.pad(uvp, ((0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = xn.shape[1], xn.shape[2]

        if pano_mode:
            rotated = self._rotated_windows(xn, pad_r, pad_b)
            rot_uv = self._rotated_windows(uvp[None], pad_r, pad_b)
        else:
            rotated = xn
            rot_uv = uvp[None]

        wins = window_partition(xn, ws).reshape(-1, ws * ws, c)
        rwins = window_partition(rotated, ws).reshape(-1, ws * ws, c)
        uv_wins = window_partition(uvp[None], ws).reshape(-1, ws * ws, 2)
        ruv_wins = window_partition(rot_uv, ws).reshape(-1, ws * ws, 2)

        n, O, _ = wins.shape
        h = self.num_heads
        hd = c // h
        scale = self.qk_scale or hd ** -0.5
        q = self.q_linear(wins).reshape(n, O, h, hd).transpose(0, 2, 1, 3)
        k = self.k_linear(rwins).reshape(n, O, h, hd).transpose(0, 2, 1, 3)
        v = self.v_linear(wins).reshape(n, O, h, hd).transpose(0, 2, 1, 3)
        bias = sphere_bias(self.alpha_table, self.beta_table, self.rel_index,
                           uv_wins, ruv_wins, pano_mode)
        if not pano_mode:
            bias = jnp.broadcast_to(bias, (uv_wins.shape[0],) + bias.shape[1:])
        out = _attention_core(q, k, v, bias, None, scale)
        out = out.transpose(0, 2, 1, 3).reshape(n, O, c)
        out = self.proj(out)

        y = window_reverse(out.reshape(-1, ws, ws, c), ws, Hp, Wp)[:, :H, :W, :]
        x = shortcut + y
        x = x + self.mlp(self.norm2(x), deterministic)
        return x


class BasicLayer(nn.Module):
    """One resolution stage: alternating W-/SW-MSA blocks, odd depth appends
    a PitchAttention block, then PatchMerging (`BasicLayer:579`)."""
    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: Tuple[float, ...] = ()
    downsample: bool = True
    use_checkpoint: bool = False
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x, uv, pano_mode=True, deterministic=True):
        depth_swin = self.depth - self.depth % 2
        # `use_checkpoint` -> jax.checkpoint (remat) per block, the TPU
        # analogue of the reference's torch.utils.checkpoint wrapping
        # (`BasicLayer.forward:705`).
        block_cls = (nn.remat(PanoSwinBlock, static_argnums=(3, 4))
                     if self.use_checkpoint else PanoSwinBlock)
        # the uv windowing + haversine couplings depend only on (shift,
        # resolution) — two variants per stage, not one per block
        uv_ctxs = {}
        for i in range(depth_swin):
            shift = 0 if i % 2 == 0 else self.window_size // 2
            if shift not in uv_ctxs:
                uv_ctxs[shift] = prepare_window_uv(
                    uv, shift, self.window_size, pano_mode)
            x = block_cls(
                dim=self.dim, num_heads=self.num_heads, window_size=self.window_size,
                shift_size=shift,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop_path=self.drop_path[i] if self.drop_path else 0.0,
                dtype=self.dtype, fused=self.fused,
                name=f"blocks_{i}")(x, uv, pano_mode, deterministic,
                                    uv_ctxs[shift])
        if self.depth % 2:
            x = PitchAttention(
                dim=self.dim, num_heads=self.num_heads, window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, name=f"blocks_{depth_swin}")(
                x, uv, pano_mode=pano_mode, deterministic=deterministic)

        x_out = x
        if self.downsample:
            x_down = PatchMerging(dtype=self.dtype, name="downsample")(x)
            _, H2, W2, _ = x_down.shape
            if pano_mode:
                uv_down = make_uv_grid(H2, W2)
            else:
                uv_down = jnp.zeros((H2, W2, 2), jnp.float32)
            return x_out, x_down, uv_down
        return x_out, x, uv


@BACKBONES.register
class PanoSwinTransformer(nn.Module):
    """PanoSwin backbone (`SimplePanoSwinTransformer:780`).

    Returns NHWC feature maps for each stage in `out_indices`.
    `pano_mode=False` reproduces planar Swin semantics (incl. the 3-conv
    stem and dual-table bias with alpha unused).
    """
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
    pano_mode: bool = True
    use_checkpoint: bool = False
    dtype: Any = None
    fused_attention: bool = False
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, images, pano_mode: Optional[bool] = None,
                 train: bool = False):
        """images: (B, H, W, in_chans) NHWC float.

        Returns tuple of (B, Hi, Wi, C_i) maps, C_i = embed_dim * 2**i.
        """
        pano = self.pano_mode if pano_mode is None else pano_mode
        deterministic = not train

        x = ConvStemPatchEmbed(self.patch_size, self.embed_dim,
                               use_norm=self.patch_norm, dtype=self.dtype,
                               fuse_bn=self.fuse_bn,
                               name="patch_embed")(images, train=train)
        B, H, W, C = x.shape

        if pano:
            uv_hw2 = make_uv_grid(H, W)
            if self.ape:
                u, v = uv_hw2[..., 0], uv_hw2[..., 1]
                xyz = jnp.stack([jnp.sin(u) * jnp.sin(v),
                                 jnp.cos(u) * jnp.sin(v),
                                 jnp.cos(v)], -1)   # `_pano_abs_position:909`
                xyzuv = jnp.concatenate([xyz, uv_hw2], -1)
                x = x + nn.Dense(self.embed_dim, kernel_init=trunc_init,
                                 name="abs_encoder")(xyzuv)[None]
            uv = uv_hw2
        else:
            uv = jnp.zeros((H, W, 2), jnp.float32)
            if self.ape:
                # keep the parameter in the tree so checkpoints round-trip
                nn.Dense(self.embed_dim, kernel_init=trunc_init,
                         name="abs_encoder")(jnp.zeros((1, 1, 5), x.dtype))

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = []
        for i in range(num_layers):
            dim_i = int(self.embed_dim * 2 ** i)
            start = sum(self.depths[:i])
            x_out, x, uv = BasicLayer(
                dim=dim_i, depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop_path=tuple(dpr[start:start + self.depths[i]]),
                downsample=i < num_layers - 1,
                use_checkpoint=self.use_checkpoint, dtype=self.dtype,
                fused=self.fused_attention,
                name=f"layers_{i}")(x, uv, pano_mode=pano, deterministic=deterministic)
            if i in self.out_indices:
                outs.append(layer_norm(f"norm{i}")(x_out.astype(jnp.float32)))
        return tuple(outs)
