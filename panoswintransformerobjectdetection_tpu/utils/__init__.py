"""Utilities: logging, environment report, profiling, visualization."""

from .logger import get_root_logger
from .env import collect_env
from .profiling import profile_time, device_trace

__all__ = ["get_root_logger", "collect_env", "profile_time", "device_trace"]
