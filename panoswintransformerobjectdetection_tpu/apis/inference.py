"""Inference API (`mmdet/apis/inference.py:16,90` analogues).

`init_detector(config, checkpoint)` builds the flax detector and loads
weights (orbax state or a converted torch .pth);
`inference_detector(model, variables, img)` runs the test pipeline + jitted
`simple_test` and returns per-class numpy boxes like the reference.
"""

import functools
from typing import Optional, Union

import numpy as np

from ..models import DETECTORS, build
from ..runtime.config import Config, load_config


def build_detector_from_cfg(cfg: dict):
    model_cfg = dict(cfg["model"])
    # `pretrained` is a weight-init directive consumed by the train API
    # (apis/train._apply_init_weights), not a module attribute
    model_cfg.pop("pretrained", None)
    return build(DETECTORS, model_cfg)


def init_detector(config: Union[str, dict], checkpoint: Optional[str] = None,
                  seed: int = 0):
    """Returns (detector, variables)."""
    import jax
    import jax.numpy as jnp
    if isinstance(config, str):
        config = load_config(config)
    det = build_detector_from_cfg(config)
    sample = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(seed), sample)
    if checkpoint:
        variables = load_weights(det, variables, checkpoint, config)
    return det, variables


def load_weights(det, variables, checkpoint: str, config: Optional[dict] = None):
    import jax
    if checkpoint.endswith((".pth", ".pt")):
        from ..runtime.checkpoint import load_torch_state_dict, convert_detector
        sd = load_torch_state_dict(checkpoint)
        bb = (config or {}).get("model", {}).get("backbone", {})
        params, stats = convert_detector(
            sd, depths=tuple(bb.get("depths", (2, 2, 6, 2))),
            window_size=bb.get("window_size", 7),
            backbone="panoswin" if "Pano" in bb.get("type", "") else "swin")
        new_vars = dict(variables)
        new_vars["params"] = params
        if stats:
            new_vars["batch_stats"] = stats
        return new_vars
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    # restore the raw tree (a training checkpoint also carries opt_state
    # and step; a published one is just params/batch_stats) and take the
    # inference leaves — a structure-matched restore would reject one or
    # the other.
    restored = ckptr.restore(checkpoint)
    new_vars = dict(variables)
    new_vars["params"] = restored["params"]
    if restored.get("batch_stats"):
        new_vars["batch_stats"] = restored["batch_stats"]
    return new_vars


def _default_test_pipeline(img_norm=None):
    from ..data.transforms import Resize, Normalize, Pad, Compose
    img_norm = img_norm or {"mean": [123.675, 116.28, 103.53],
                            "std": [58.395, 57.12, 57.375], "to_rgb": True}
    return Compose([
        Resize(img_scale=(800, 1333)),
        Normalize(**img_norm),
        Pad(size_divisor=32),
    ])


_JIT_CACHE: dict = {}


def _jitted_simple_test(det):
    # keyed by object identity: flax modules with dict-valued config
    # attributes are unhashable, so lru_cache can't be used
    import jax
    key = id(det)
    if key not in _JIT_CACHE:
        def fn(variables, images, img_shapes, scale_factors):
            return det.apply(variables, images, img_shapes, scale_factors,
                             method=det.simple_test)
        _JIT_CACHE[key] = jax.jit(fn)
    return _JIT_CACHE[key]


def inference_detector(det, variables, img, pipeline=None, num_classes=None):
    """img: path or HWC BGR uint8/float numpy array.

    Returns list[np.ndarray (k, 5)] per class — the reference's
    `bbox2result` format (x1, y1, x2, y2, score).
    """
    import cv2
    import jax.numpy as jnp
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    results = {"img": img.astype(np.float32), "img_shape": img.shape,
               "ori_shape": img.shape, "scale_factor": np.ones(4, np.float32)}
    pipeline = pipeline or _default_test_pipeline()
    results = pipeline(results)
    im = results["img"]
    images = jnp.asarray(im[None])
    img_shapes = jnp.asarray(
        np.array([[results["img_shape"][0], results["img_shape"][1]]], np.float32))
    scale_factors = jnp.asarray(results["scale_factor"][None])
    out = _jitted_simple_test(det)(variables, images, img_shapes, scale_factors)

    boxes = np.asarray(out.boxes[0])
    scores = np.asarray(out.scores[0])
    labels = np.asarray(out.labels[0])
    mask = np.asarray(out.mask[0])
    nc = num_classes or getattr(det, "num_classes", int(labels.max()) + 1 if mask.any() else 1)
    per_class = []
    for c in range(nc):
        sel = mask & (labels == c)
        per_class.append(
            np.concatenate([boxes[sel], scores[sel, None]], axis=1).astype(np.float32))
    return per_class


async def async_inference_detector(det, variables, img, pipeline=None,
                                   num_classes=None):
    """`mmdet/apis/inference.py async_inference_detector` analogue.

    JAX dispatch is already asynchronous; the await point hands the
    device-to-host fetch to a worker thread so the event loop stays free
    (the reference awaits the CUDA stream the same way).
    """
    import asyncio
    import functools as _ft
    loop = asyncio.get_event_loop()
    return await loop.run_in_executor(
        None, _ft.partial(inference_detector, det, variables, img,
                          pipeline=pipeline, num_classes=num_classes))


def show_result_pyplot(det, img, result, score_thr: float = 0.3,
                       fig_size=(15, 10), title: str = "result",
                       class_names=None, out_file: Optional[str] = None):
    """`mmdet/apis/inference.py show_result_pyplot` analogue.

    `result` is the `inference_detector` return value (per-class list of
    (k, 5) arrays).  Renders boxes on the image; shows a matplotlib
    figure when a display is available, and/or writes `out_file`.
    Returns the drawn BGR image.
    """
    import cv2
    from ..utils.visualize import show_result as _draw
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    boxes = np.concatenate([r[:, :4] for r in result]) if result else \
        np.zeros((0, 4), np.float32)
    scores = np.concatenate([r[:, 4] for r in result]) if result else \
        np.zeros((0,), np.float32)
    labels = np.concatenate([np.full(len(r), c, np.int64)
                             for c, r in enumerate(result)]) if result else \
        np.zeros((0,), np.int64)
    drawn = _draw(img, {"boxes": boxes, "scores": scores, "labels": labels},
                  class_names=class_names or getattr(det, "classes", None),
                  score_thr=score_thr, out_file=out_file)
    try:
        import matplotlib
        if matplotlib.get_backend().lower() != "agg":
            import matplotlib.pyplot as plt
            plt.figure(figsize=fig_size)
            plt.imshow(cv2.cvtColor(drawn, cv2.COLOR_BGR2RGB))
            plt.title(title)
            plt.axis("off")
            plt.show()
    except Exception:
        pass  # headless environments: the rendered array / out_file suffice
    return drawn
