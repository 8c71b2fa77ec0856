"""Model zoo: backbones, necks, heads, detectors (flax.linen modules)."""

from .registry import BACKBONES, NECKS, HEADS, DETECTORS, LOSSES, build, register

from ..core.losses import _register_losses as _reg_losses
_reg_losses()   # populate LOSSES (deferred from core.losses: import order)
del _reg_losses
from . import panoswin  # noqa: F401  (registers PanoSwinTransformer)
from . import panoswin_v2  # noqa: F401
from . import panoswin_v1  # noqa: F401
from . import swin  # noqa: F401
from . import fpn  # noqa: F401
from . import fpg  # noqa: F401
from . import rpn_head  # noqa: F401
from . import roi_head  # noqa: F401
from . import mask_head  # noqa: F401
from . import resnet  # noqa: F401
from . import backbones_extra  # noqa: F401
from . import detectors  # noqa: F401
from . import cascade  # noqa: F401
from . import classifier  # noqa: F401
from . import retinanet  # noqa: F401
from . import fcos  # noqa: F401
from . import detr  # noqa: F401
from . import yolo  # noqa: F401
from . import ssd  # noqa: F401
from . import atss  # noqa: F401
from . import gfl  # noqa: F401
from . import fovea  # noqa: F401
from . import fsaf  # noqa: F401
from . import vfnet  # noqa: F401
from . import paa  # noqa: F401
from . import cornernet  # noqa: F401
from . import yolact  # noqa: F401
from . import point_rend  # noqa: F401
from . import grid_rcnn  # noqa: F401
from . import sparse_rcnn  # noqa: F401
from . import scnet  # noqa: F401
from . import guided_anchor  # noqa: F401
from . import sabl  # noqa: F401
from . import cascade_rpn  # noqa: F401
from . import reppoints  # noqa: F401
from . import htc  # noqa: F401
from . import hrnet  # noqa: F401
from . import hourglass  # noqa: F401

def build_backbone(cfg):
    """`mmdet/models/builder.py:38` analogue."""
    return build(BACKBONES, cfg)


def build_neck(cfg):
    """`mmdet/models/builder.py:43` analogue."""
    return build(NECKS, cfg)


def build_head(cfg):
    """`mmdet/models/builder.py:58` analogue."""
    return build(HEADS, cfg)


def build_loss(cfg):
    """`mmdet/models/builder.py:63` analogue: returns the loss *callable*
    from `core.losses` (losses here are functions, not modules)."""
    return build(LOSSES, cfg)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    """`mmdet/models/builder.py:68` analogue.  `cfg` is the model dict
    (with `type`); optional train_cfg/test_cfg are merged in the same way
    the reference injects them as constructor kwargs."""
    cfg = dict(cfg)
    cfg.pop("pretrained", None)   # weight-init directive, not an attribute
    if train_cfg is not None:
        cfg["train_cfg"] = train_cfg
    if test_cfg is not None:
        cfg["test_cfg"] = test_cfg
    return build(DETECTORS, cfg)


__all__ = ["BACKBONES", "NECKS", "HEADS", "DETECTORS", "LOSSES", "build",
           "register", "build_backbone", "build_neck", "build_head",
           "build_loss", "build_detector"]
