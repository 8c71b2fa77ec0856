"""GeneralizedAttention backbone plugin (empirical spatial attention).

Replaces `mmcv.ops.GeneralizedAttention` as used by
`configs/empirical_attention/*` (reference config:
`faster_rcnn_r50_fpn_attention_1111_1x_coco.py` — plugin after conv2 of
res4/res5). Implements the four-term factorized attention energy of
"An Empirical Study of Spatial Attention Mechanisms in Deep Networks"
(the Transformer-XL decomposition the mmcv op realizes):

  E(q, k) =  (1) q_content · k_content      [attention_type[0]]
           + (2) q_content · rel_position   [attention_type[1]]
           + (3) u_bias    · k_content      [attention_type[2]]
           + (4) v_bias    · rel_position   [attention_type[3]]

'0010' keeps only the query-independent key-content term (the GCNet-like
configuration); '1111' enables everything. Relative positions factorize
per axis (y and x sine embeddings, projected per head) and the kv grid
is max-pool strided by `kv_stride`. The attention output enters through
a zero-initialized projection, so an attention-augmented block equals
the plain pretrained block at initialization.

TPU notes: everything is dense einsum on fixed shapes — the energy
tensor (B, Hq, Wq, heads, Hk, Wk) stays in registers/VMEM-sized tiles
under XLA fusion; no gathers.
"""

from typing import Any

import numpy as np

import jax.numpy as jnp
import flax.linen as nn


def _sine_rel_embedding(n_q: int, n_k: int, stride: int, dim: int,
                        magnitude: float) -> np.ndarray:
    """(n_q, n_k, dim) sine/cosine features of scaled relative offsets."""
    q_pos = np.arange(n_q, dtype=np.float64)
    k_pos = np.arange(n_k, dtype=np.float64) * stride
    rel = (q_pos[:, None] - k_pos[None, :]) / magnitude
    half = max(dim // 2, 1)
    freqs = 1.0 / (100.0 ** (np.arange(half, dtype=np.float64) / half))
    ang = rel[..., None] * freqs
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    return emb[..., :dim].astype(np.float32)


class GeneralizedAttention(nn.Module):
    """x: (B, H, W, C) -> (B, H, W, C) with a zero-init residual."""
    in_channels: int
    num_heads: int = 8
    attention_type: str = "1111"
    kv_stride: int = 2
    q_stride: int = 1          # reference configs keep 1
    spatial_range: int = -1    # -1 = global (the configs' setting)
    position_embedding_dim: int = -1
    position_magnitude: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        assert self.q_stride == 1, "only q_stride=1 is configured upstream"
        use = [c == "1" for c in self.attention_type]
        B, H, W, C = x.shape
        nh = self.num_heads
        dk = max(C // nh, 1)
        pe_dim = self.position_embedding_dim if self.position_embedding_dim > 0 else C
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)

        kv = xf
        if self.kv_stride > 1:
            kv = nn.max_pool(xf, (self.kv_stride, self.kv_stride),
                             strides=(self.kv_stride, self.kv_stride))
        Hk, Wk = kv.shape[1], kv.shape[2]

        need_q = use[0] or use[1]
        need_k = use[0] or use[2]
        need_r = use[1] or use[3]

        e = jnp.zeros((B, H, W, nh, Hk, Wk), jnp.float32)
        scale = 1.0 / np.sqrt(dk)
        if need_q:
            q = nn.Conv(nh * dk, (1, 1), use_bias=False, name="query_conv")(xf)
            q = q.reshape(B, H, W, nh, dk) * scale
        if need_k:
            k = nn.Conv(nh * dk, (1, 1), use_bias=False, name="key_conv")(kv)
            k = k.reshape(B, Hk, Wk, nh, dk)
        if need_r:
            ry = _sine_rel_embedding(H, Hk, self.kv_stride, pe_dim,
                                     self.position_magnitude)
            rx = _sine_rel_embedding(W, Wk, self.kv_stride, pe_dim,
                                     self.position_magnitude)
            # per-head projection of the sine features (mmcv's
            # appr_geom linear maps), shared across batch
            ry = nn.Dense(nh * dk, use_bias=False,
                          name="pos_proj_y")(jnp.asarray(ry))
            rx = nn.Dense(nh * dk, use_bias=False,
                          name="pos_proj_x")(jnp.asarray(rx))
            ry = ry.reshape(H, Hk, nh, dk)
            rx = rx.reshape(W, Wk, nh, dk)

        if use[0]:
            e = e + jnp.einsum("byxhd,buvhd->byxhuv", q, k)
        if use[1]:
            e = e + (jnp.einsum("byxhd,yuhd->byxhu", q, ry)[..., :, None]
                     + jnp.einsum("byxhd,xvhd->byxhv", q, rx)[..., None, :])
        if use[2]:
            u = self.param("appr_bias", nn.initializers.normal(0.02),
                           (nh, dk))
            e = e + jnp.einsum("hd,buvhd->bhuv", u * scale,
                               k)[:, None, None]
        if use[3]:
            v_b = self.param("geom_bias", nn.initializers.normal(0.02),
                             (nh, dk))
            e = e + (jnp.einsum("hd,yuhd->yhu", v_b * scale,
                                ry)[None, :, None, :, :, None]
                     + jnp.einsum("hd,xvhd->xhv", v_b * scale,
                                  rx)[None, None, :, :, None, :])

        attn = nn.softmax(e.reshape(B, H, W, nh, Hk * Wk), axis=-1)
        attn = attn.reshape(B, H, W, nh, Hk, Wk)
        val = nn.Conv(nh * dk, (1, 1), use_bias=False, name="value_conv")(kv)
        val = val.reshape(B, Hk, Wk, nh, dk)
        out = jnp.einsum("byxhuv,buvhd->byxhd", attn, val)
        out = out.reshape(B, H, W, nh * dk)
        # zero-init projection: identity residual at initialization
        out = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                      name="proj_conv")(out)
        return (xf + out).astype(orig_dtype)
