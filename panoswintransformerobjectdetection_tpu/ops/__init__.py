"""TPU compute ops: window utilities, fused attention, RoIAlign, NMS."""

from .resample_alias import point_sample  # noqa: F401
from .windows import (
    window_partition,
    window_reverse,
    make_relative_position_index,
    swin_attention_mask,
    pad_to_multiple,
    window_transition,
    window_transition_reverse,
)

__all__ = [
    "window_partition", "window_reverse", "make_relative_position_index",
    "swin_attention_mask", "pad_to_multiple", "window_transition",
    "window_transition_reverse",
]
