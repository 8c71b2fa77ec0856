"""Model zoo: backbones, necks, heads, detectors (flax.linen modules)."""

from .registry import BACKBONES, NECKS, HEADS, DETECTORS, LOSSES, build, register
from . import panoswin  # noqa: F401  (registers PanoSwinTransformer)

__all__ = ["BACKBONES", "NECKS", "HEADS", "DETECTORS", "LOSSES", "build", "register"]
