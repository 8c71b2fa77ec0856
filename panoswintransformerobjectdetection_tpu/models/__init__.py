"""Model zoo: backbones, necks, heads, detectors (flax.linen modules)."""

from .registry import BACKBONES, NECKS, HEADS, DETECTORS, LOSSES, build, register
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

__all__ = ["BACKBONES", "NECKS", "HEADS", "DETECTORS", "LOSSES", "build", "register"]
