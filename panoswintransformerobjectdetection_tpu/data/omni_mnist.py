"""OmniMNIST: MNIST digits gnomonically projected onto the sphere.

Second workload of the reference (`lzx/omni_mnist/omni_mnist.py:78`):
each digit is placed on a random tangent plane of the sphere and rendered
to an equirect panorama (`uv2img_idx:45` inverse-projection sampling).
Host-side numpy; returns (pano (H, W, 1), label).
"""

import math
from typing import Optional, Tuple

import numpy as np

PI = math.pi


def project_digit(digit: np.ndarray, pano_h: int = 60, pano_w: int = 120,
                  u0: float = 0.0, v0: float = 0.0, fov: float = 0.7,
                  ) -> np.ndarray:
    """Render one digit (h, w) onto an equirect pano via inverse gnomonic
    sampling centered at (u0, v0) with tangent-plane half-extent `fov`."""
    h, w = digit.shape
    u = (np.arange(pano_w) + 0.5) / pano_w * 2 * PI - PI
    v = (np.arange(pano_h) + 0.5) / pano_h * PI - 0.5 * PI
    uu, vv = np.meshgrid(u, v)
    # forward gnomonic: pano uv -> tangent xy at (u0, v0)
    cosc = np.sin(v0) * np.sin(vv) + np.cos(v0) * np.cos(vv) * np.cos(uu - u0)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = np.cos(vv) * np.sin(uu - u0) / cosc
        y = (np.cos(v0) * np.sin(vv) - np.sin(v0) * np.cos(vv) * np.cos(uu - u0)) / cosc
    px = (x / fov * 0.5 + 0.5) * w - 0.5
    py = (y / fov * 0.5 + 0.5) * h - 0.5
    valid = (cosc > 0) & (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
    px = np.clip(px, 0, w - 1)
    py = np.clip(py, 0, h - 1)
    x0 = np.floor(px).astype(int)
    y0 = np.floor(py).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = px - x0
    wy = py - y0
    val = (digit[y0, x0] * (1 - wx) * (1 - wy) + digit[y0, x1] * wx * (1 - wy) +
           digit[y1, x0] * (1 - wx) * wy + digit[y1, x1] * wx * wy)
    return np.where(valid, val, 0.0).astype(np.float32)


class OmniMNIST:
    """Spherical MNIST dataset with random rotations (`OmniDataset`)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 pano_h: int = 60, pano_w: int = 120, seed: int = 0,
                 random_rotate: bool = True):
        self.images = images.astype(np.float32) / max(float(images.max()), 1.0)
        self.labels = labels.astype(np.int32)
        self.pano_h = pano_h
        self.pano_w = pano_w
        self.rng = np.random.default_rng(seed)
        self.random_rotate = random_rotate

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        if self.random_rotate:
            u0 = self.rng.uniform(-PI, PI)
            v0 = self.rng.uniform(-0.4 * PI, 0.4 * PI)
        else:
            u0 = v0 = 0.0
        pano = project_digit(self.images[i], self.pano_h, self.pano_w, u0, v0)
        return pano[..., None], int(self.labels[i])

    def batches(self, batch_size: int, shuffle: bool = True):
        idx = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(idx)
        for s in range(0, len(idx) - len(idx) % batch_size, batch_size):
            chunk = idx[s:s + batch_size]
            imgs = np.stack([self[i][0] for i in chunk])
            labs = np.array([self.labels[i] for i in chunk], np.int32)
            yield imgs, labs
