"""panoswintransformerobjectdetection_tpu — a TPU-native panorama detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
PanoSwin Transformer object-detection codebase (CVPR'23 "PanoSwin: a
Pano-style Swin Transformer for Panorama Understanding", reference:
mmdetection-v2.11 fork). The compute path is jax/flax/pallas; detection
post-processing is fixed-shape XLA; parallelism is `jax.sharding` over
device meshes.

Subpackages
-----------
- ``geometry``: spherical / equirectangular geometry (uv grids, haversine,
  great-circle rotation, tangent projection, bilinear resampling).
- ``models``: backbones (Swin, PanoSwin, ResNet), necks (FPN), dense heads
  (RPN), RoI heads, detectors (Faster/Mask R-CNN, PanoFasterRCNN).
- ``ops``: TPU kernels — fused window attention (Pallas), RoIAlign, NMS.
- ``core``: detection algorithm core — anchors, box coding, IoU,
  assignment/sampling (fixed-shape), losses, evaluation.
- ``data``: host-side dataset + pipeline (pano augmentations, bucketing).
- ``parallel``: mesh construction and sharding utilities.
- ``runtime``: train/eval loops, optimizers, checkpointing, config system.
- ``apis``: user-facing init/inference/train/test entry points.
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401
