"""High-level APIs (`mmdet/apis/` analogues): init/inference/train/test."""

from .inference import (async_inference_detector, inference_detector,
                        init_detector, show_result_pyplot)
from .train import set_random_seed, train_detector
from .test import single_device_test, multi_host_test
from ..utils.logger import get_root_logger

__all__ = ["get_root_logger", "set_random_seed", "train_detector",
           "init_detector", "async_inference_detector", "inference_detector",
           "show_result_pyplot", "single_device_test", "multi_host_test"]
