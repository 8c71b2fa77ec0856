"""Window partition / reverse / shift machinery for (Pano)Swin attention.

All shapes are static under jit, so pano-shift (a topology-aware sequence
rotation: horizontal roll -> ew2ns pole rotation -> vertical roll) compiles
to pure layout ops.  Mirrors the semantics of
`simple_panoswin_transformer.py` (`window_partition:64`, `window_reverse:78`,
`make_relative_position_index:95`, `WindowTransition:326`,
`BasicLayer._get_attention_mask:664`) with the reference's stateful
odd-width pad flag replaced by static shape bookkeeping.
"""

import numpy as np
import jax.numpy as jnp

from ..geometry.axis import ew2ns, ns2we


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * H/ws * W/ws, ws, ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, C)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of `window_partition`: (nW*B, ws, ws, C) -> (B, H, W, C)."""
    ws = window_size
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def make_relative_position_index(window_size) -> np.ndarray:
    """(O, O) int32 lookup into the (2Wh-1)(2Ww-1) relative-bias table.

    Static (numpy) — computed once at module setup.
    """
    if isinstance(window_size, int):
        window_size = (window_size, window_size)
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


def swin_attention_mask(Hp: int, Wp: int, window_size: int, shift_size: int,
                        neg: float = -100.0) -> np.ndarray:
    """Planar-mode shifted-window mask: (nW, O, O) with 0 / `neg` entries.

    Static (numpy) — the 9-region construction of the stock Swin mask.
    """
    ws, ss = window_size, shift_size
    img = np.zeros((Hp, Wp), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, neg, 0.0).astype(np.float32)


def pad_to_multiple(x: jnp.ndarray, multiple: int):
    """Zero-pad spatial dims of (B, H, W, C) up to the next multiple.

    Returns (padded, (H, W)) with the original spatial shape.
    """
    B, H, W, C = x.shape
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (H, W)


def window_transition(x: jnp.ndarray, shift_size: int, pano_mode: bool) -> jnp.ndarray:
    """Forward (pano-)shift of a (..., H, W, C) feature map (batch dims
    optional — the uv side-band rides through unbatched).

    planar: 2-D `roll` by -shift (stock Swin cyclic shift).
    pano:   horizontal roll(+shift) -> ew2ns pole rotation (width padded to
            even if odd) -> vertical roll(+shift); the seam and the poles
            become window-contiguous (`WindowTransition.forward:376`).
    """
    if not pano_mode:
        return jnp.roll(x, shift=(-shift_size, -shift_size), axis=(-3, -2))
    x = jnp.roll(x, shift=shift_size, axis=-2)
    if x.shape[-2] % 2:
        pad = [(0, 0)] * x.ndim
        pad[-2] = (0, 1)
        x = jnp.pad(x, pad)
    x = ew2ns(x)
    x = jnp.roll(x, shift=shift_size, axis=-3)
    return x


def window_transition_reverse(x: jnp.ndarray, shift_size: int, pano_mode: bool,
                              width_was_odd: bool = False) -> jnp.ndarray:
    """Inverse of `window_transition`; `width_was_odd` undoes the even-pad."""
    if not pano_mode:
        return jnp.roll(x, shift=(shift_size, shift_size), axis=(-3, -2))
    x = jnp.roll(x, shift=-shift_size, axis=-3)
    x = ns2we(x)
    if width_was_odd:
        x = x[..., :, :-1, :]
    x = jnp.roll(x, shift=-shift_size, axis=-2)
    return x


_SEL_CACHE = {}


def table_lookup(table: jnp.ndarray, rel_index: np.ndarray) -> jnp.ndarray:
    """`table[rel_index]` for a STATIC integer index array, computed as a
    constant one-hot matmul instead of a gather.

    XLA lowers even small parameter-table gathers to a serial scalar loop
    on the TPU backend (~70 ns/element); the equivalent 0/1 selection
    matrix is folded to a tiny MXU GEMM.  precision='highest' keeps the
    selection exact (each output row is one table row).  Returns
    rel_index.shape + table.shape[1:].
    """
    T = table.shape[0]
    key = (rel_index.shape, rel_index.tobytes(), T)
    sel = _SEL_CACHE.get(key)
    if sel is None:
        sel = np.zeros((rel_index.size, T), np.float32)
        sel[np.arange(rel_index.size), rel_index.reshape(-1)] = 1.0
        _SEL_CACHE[key] = sel
    out = jnp.einsum("ot,t...->o...", jnp.asarray(sel, table.dtype), table,
                     precision="highest")
    return out.reshape(rel_index.shape + table.shape[1:])
