"""High-level APIs (`mmdet/apis/` analogues): init/inference/train/test."""

from .inference import init_detector, inference_detector
from .train import train_detector
from .test import single_device_test, multi_host_test

__all__ = ["init_detector", "inference_detector", "train_detector",
           "single_device_test", "multi_host_test"]
