"""`mmdet/models/utils/` named surface, mapped onto the flax modules.

Where the reference exposes free-standing torch modules, this framework
implements the same math inside the model files (DETR transformer in
`models/detr.py`, DynamicConv inside `models/sparse_rcnn.py DIIHead`,
ResLayer inside `models/roi_head.py ResLayerSharedHead` role); this module
re-exports the reusable pieces under their reference names and provides
the two utilities custom heads actually call (`gaussian_radius`,
`gen_gaussian_target`).
"""

import jax.numpy as jnp

from .cornernet import gaussian_radius, draw_gaussians
from .detr import (sine_positional_encoding, MHSA as MultiheadAttention,
                   EncoderLayer as TransformerEncoderLayer,
                   DecoderLayer as TransformerDecoderLayer)


def gen_gaussian_target(heatmap, center, radius, k: float = 1.0):
    """`mmdet/models/utils/gaussian_target.py gen_gaussian_target`:
    splat one 2-D gaussian of `radius` at integer `center` (x, y) into
    `heatmap` (H, W) via elementwise max.  Fixed-shape: the gaussian is
    evaluated over the full grid (no dynamic slicing — XLA fuses it)."""
    H, W = heatmap.shape
    cx, cy = center
    sigma = (2 * radius + 1) / 6.0
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    g = jnp.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma * sigma))
    g = jnp.where(g < jnp.finfo(jnp.float32).eps * g.max(), 0.0, g)
    return jnp.maximum(heatmap, g * k)


def SinePositionalEncoding(num_feats: int, normalize: bool = True,
                           temperature: float = 10000.0):
    """`positional_encoding.py SinePositionalEncoding` as a closure:
    returns encode(h, w) -> (h, w, 2*num_feats).  The underlying encoding
    always normalizes coordinates to [0, 2pi] (the reference's
    normalize=True mode, the only mode its configs use)."""
    assert normalize, "only the normalized mode is implemented"

    def encode(h, w):
        return sine_positional_encoding(h, w, 2 * num_feats,
                                        temperature=temperature)
    return encode


__all__ = [
    "gaussian_radius", "gen_gaussian_target", "draw_gaussians",
    "MultiheadAttention", "TransformerEncoderLayer",
    "TransformerDecoderLayer", "SinePositionalEncoding",
    "sine_positional_encoding",
]
