"""Import pure-torch pieces of the reference repo for numerical parity tests.

The reference at /root/reference has heavy optional deps (pycocotools,
torchvision, mmcv); the geometry modules only need torch + cv2 + einops, so
we stub the rest.  Parity tests must degrade to skip if the reference tree
is unavailable.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUBS = {
    "pycocotools": {},
    "pycocotools.coco": {"COCO": object},
    "pycocotools.mask": {"encode": None, "decode": None, "area": None, "toBbox": None},
    "torchvision": {},
    "torchvision.transforms": {"ToTensor": object},
    "torchvision.models": {},
    "pkg_resources": {"parse_version": lambda v: v},
}


def load_reference():
    """Returns the dict of reference modules, or None if unavailable."""
    try:
        for name, attrs in _STUBS.items():
            if name not in sys.modules:
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
        sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
        sys.modules["torchvision"].models = sys.modules["torchvision.models"]
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        import lzx.models.great_circle as great_circle
        import lzx.pano_rotate as pano_rotate
        import lzx.tangent_and_equirectangular as tangent
        import lzx.pano_axis_trans as axis
        return {
            "great_circle": great_circle,
            "pano_rotate": pano_rotate,
            "tangent": tangent,
            "axis": axis,
        }
    except Exception:
        return None
