"""Pole-centered recomposition of equirectangular maps (flip+concat identities).

Redesign of `lzx/pano_axis_trans.py` (`ew2ns:101`, `ns2we:117`, `pole_cat2:55`)
in channel-last layout: arrays are (..., H, W, C), H axis = -3, W axis = -2.
These are static permutations — XLA lowers them to layout ops, no compute.
"""

import jax.numpy as jnp


def ew2ns(x: jnp.ndarray) -> jnp.ndarray:
    """East-west pano -> north-south: the right half is flipped in both
    spatial axes and stacked above the left half.  Requires even W.

    (..., H, W, C) -> (..., 2H, W/2, C).
    """
    W = x.shape[-2]
    assert W % 2 == 0, f"ew2ns needs even width, got {W}"
    ms = W // 2
    left = x[..., :, :ms, :]
    right = x[..., :, ms:, :]
    right = jnp.flip(right, axis=(-3, -2))
    return jnp.concatenate([right, left], axis=-3)


def ns2we(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `ew2ns`: top half flipped in both spatial axes and placed
    to the right of the bottom half.  Requires even H.

    (..., 2H, W, C) -> (..., H, 2W, C).
    """
    H = x.shape[-3]
    assert H % 2 == 0, f"ns2we needs even height, got {H}"
    ms = H // 2
    top = x[..., :ms, :, :]
    bottom = x[..., ms:, :, :]
    top = jnp.flip(top, axis=(-3, -2))
    return jnp.concatenate([bottom, top], axis=-2)


def pole_cat(x: jnp.ndarray, center: str = "N") -> jnp.ndarray:
    """Recompose a W=2H pano so a pole is at the image center
    (reference `pole_cat2`): equivalent to `ew2ns`, optionally rolled to
    put the south pole in the middle.  (..., H, 2H, C) -> (..., 2H, H, C).
    """
    H = x.shape[-3]
    assert x.shape[-2] == 2 * H, f"pole_cat needs W == 2H, got {x.shape}"
    out = ew2ns(x)
    if center == "S":
        out = jnp.roll(out, shift=H, axis=-3)
    return out
