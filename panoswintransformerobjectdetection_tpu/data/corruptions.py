"""Image corruption suite for the robustness benchmark.

numpy/cv2 reimplementations of the benchmark corruptions the reference's
`tools/analysis_tools/test_robustness.py` applies via the external
`imagecorruptions` package (blur / noise / weather / digital families,
severity 1-5).  Host-side: corruptions run in the data pipeline before
device transfer, like any other transform.
"""

from typing import Callable, Dict

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _rng(img):
    # deterministic per-image noise: seed from a cheap content hash
    return np.random.default_rng(int(np.abs(img[::7, ::7]).sum()) % (2 ** 31))


def gaussian_noise(img, severity):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    x = img.astype(np.float32) / 255.0
    x = x + _rng(img).normal(0, c, x.shape)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def shot_noise(img, severity):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = img.astype(np.float32) / 255.0
    x = _rng(img).poisson(x * c) / c
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def impulse_noise(img, severity):
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = _rng(img)
    x = img.copy()
    m = rng.random(x.shape[:2])
    x[m < c / 2] = 0
    x[m > 1 - c / 2] = 255
    return x


def defocus_blur(img, severity):
    c = [3, 4, 6, 8, 10][severity - 1]
    k = np.zeros((2 * c + 1, 2 * c + 1), np.float32)
    y, x = np.ogrid[-c:c + 1, -c:c + 1]
    k[x * x + y * y <= c * c] = 1
    k /= k.sum()
    return cv2.filter2D(img, -1, k)


def motion_blur(img, severity):
    c = [7, 9, 13, 17, 21][severity - 1]
    k = np.zeros((c, c), np.float32)
    k[c // 2, :] = 1.0 / c
    return cv2.filter2D(img, -1, k)


def zoom_blur(img, severity):
    zooms = np.arange(1, [1.06, 1.11, 1.16, 1.21, 1.26][severity - 1], 0.01)
    h, w = img.shape[:2]
    out = np.zeros_like(img, np.float32)
    for z in zooms:
        zh, zw = int(h / z), int(w / z)
        y0, x0 = (h - zh) // 2, (w - zw) // 2
        crop = img[y0:y0 + zh, x0:x0 + zw]
        out += cv2.resize(crop, (w, h)).astype(np.float32)
    return np.clip(out / len(zooms), 0, 255).astype(np.uint8)


def fog(img, severity):
    c = [0.12, 0.18, 0.26, 0.34, 0.42][severity - 1]
    x = img.astype(np.float32) / 255.0
    return (np.clip(x * (1 - c) + c, 0, 1) * 255).astype(np.uint8)


def brightness(img, severity):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    x = img.astype(np.float32) / 255.0 + c
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def contrast(img, severity):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = img.astype(np.float32)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return np.clip((x - mean) * c + mean, 0, 255).astype(np.uint8)


def pixelate(img, severity):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity):
    c = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, c])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


CORRUPTIONS: Dict[str, Callable] = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
}

BENCHMARK_CORRUPTIONS = tuple(CORRUPTIONS)


def corrupt(img: np.ndarray, corruption: str, severity: int) -> np.ndarray:
    """Apply a named corruption at severity 1-5 to a uint8 HWC image."""
    assert 1 <= severity <= 5, severity
    return CORRUPTIONS[corruption](np.ascontiguousarray(img), severity)


class Corrupt:
    """Pipeline transform: corrupt `results['img']` in place (the
    reference injects the same step into the test pipeline,
    `test_robustness.py` corrupt dict)."""

    def __init__(self, corruption: str, severity: int = 1):
        self.corruption = corruption
        self.severity = severity

    def __call__(self, results):
        if self.severity == 0:
            return results
        img = results["img"]
        as_float = img.dtype != np.uint8
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        out = corrupt(u8, self.corruption, self.severity)
        results["img"] = out.astype(np.float32) if as_float else out
        return results
