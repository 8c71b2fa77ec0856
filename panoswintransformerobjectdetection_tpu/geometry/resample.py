"""Batched bilinear grid resampling — the TPU replacement for cuDNN grid_sample.

Implements the exact coordinate conventions of `torch.nn.functional.grid_sample`
(used by the reference at `lzx/pano_rotate.py:186` and
`simple_panoswin_transformer.py:1090`): grid values in [-1, 1], (x, y) order,
`align_corners=False` unnormalization `pix = ((g + 1) * size - 1) / 2`,
'border' or 'zeros' padding.  Implemented as a flat gather + 4-tap lerp,
which XLA lowers to efficient dynamic-gathers on TPU.
"""

import jax.numpy as jnp


def _unnormalize(g, size, align_corners):
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample_nhwc(img: jnp.ndarray, grid: jnp.ndarray,
                     padding_mode: str = "border",
                     align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample. img: (B, H, W, C); grid: (B, Hg, Wg, 2) xy in [-1, 1].

    Returns (B, Hg, Wg, C).
    """
    B, H, W, C = img.shape
    _, Hg, Wg, _ = grid.shape

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def clipx(i):
        return jnp.clip(i, 0, W - 1)

    def clipy(i):
        return jnp.clip(i, 0, H - 1)

    if padding_mode == "zeros":
        vx0 = (x0i >= 0) & (x0i < W)
        vx1 = (x1i >= 0) & (x1i < W)
        vy0 = (y0i >= 0) & (y0i < H)
        vy1 = (y1i >= 0) & (y1i < H)
    elif padding_mode == "border":
        vx0 = vx1 = vy0 = vy1 = None
    else:
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0c, x1c, y0c, y1c = clipx(x0i), clipx(x1i), clipy(y0i), clipy(y1i)

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, Hg * Wg)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(B, Hg, Wg, C)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = (1.0 - wx) * (1.0 - wy)
    w01 = wx * (1.0 - wy)
    w10 = (1.0 - wx) * wy
    w11 = wx * wy
    if padding_mode == "zeros":
        w00 = jnp.where(vy0 & vx0, w00, 0.0)
        w01 = jnp.where(vy0 & vx1, w01, 0.0)
        w10 = jnp.where(vy1 & vx0, w10, 0.0)
        w11 = jnp.where(vy1 & vx1, w11, 0.0)

    out = (v00 * w00[..., None] + v01 * w01[..., None] +
           v10 * w10[..., None] + v11 * w11[..., None])
    return out.astype(img.dtype)


def grid_sample(img_bchw: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "border",
                align_corners: bool = False) -> jnp.ndarray:
    """torch-layout wrapper: img (B, C, H, W), grid (B, Hg, Wg, 2) -> (B, C, Hg, Wg)."""
    img = jnp.moveaxis(img_bchw, 1, -1)
    out = grid_sample_nhwc(img, grid, padding_mode, align_corners)
    return jnp.moveaxis(out, -1, 1)


# --------------------------------------------------------------- bicubic
def _torch_cubic_weights(out_size: int, in_size: int,
                         align_corners: bool = False):
    """Per-output-row weights over input rows for torch's bicubic kernel
    (cubic convolution, A = -0.75; `F.interpolate(mode='bicubic')`).
    Returns a dense (out_size, in_size) numpy matrix; border taps clamp and
    accumulate, exactly like the aten CPU/CUDA kernels."""
    import numpy as np
    A = -0.75

    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1, ((A + 2) * t - (A + 3)) * t * t + 1,
            np.where(t < 2, A * (((t - 5) * t + 8) * t - 4), 0.0))

    i = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    f = np.floor(src)
    frac = src - f
    W = np.zeros((out_size, in_size), np.float64)
    for tap in (-1, 0, 1, 2):
        w = k(frac - tap)
        idx = np.clip(f.astype(np.int64) + tap, 0, in_size - 1)
        np.add.at(W, (np.arange(out_size), idx), w)
    return W


def interpolate_bicubic(img: jnp.ndarray, out_h: int, out_w: int,
                        align_corners: bool = False) -> jnp.ndarray:
    """torch-exact `F.interpolate(mode='bicubic')` on NHWC images, as two
    dense matmuls (separable kernel) — MXU-friendly and bit-matching the
    reference's ape/bias-table resizing (`swin_transformer.py` ape path,
    `mmcv_custom/checkpoint.py:336-352`)."""
    import numpy as np
    B, H, W, C = img.shape
    if (H, W) == (out_h, out_w):
        return img
    wh = jnp.asarray(_torch_cubic_weights(out_h, H, align_corners),
                     img.dtype)
    ww = jnp.asarray(_torch_cubic_weights(out_w, W, align_corners),
                     img.dtype)
    # rows then cols; highest precision so parity holds under TPU bf16
    # matmul defaults (the weights span 4 taps — error would be ~5e-3)
    x = jnp.einsum("oh,bhwc->bowc", wh, img, precision="highest")
    return jnp.einsum("ow,bhwc->bhoc", ww, x, precision="highest")
