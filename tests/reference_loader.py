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


def _stub(name, attrs=None):
    import types as _t
    m = _t.ModuleType(name)
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_panoswin():
    """Import the reference SimplePanoSwinTransformer under torch CPU by
    stubbing its heavy deps (timm/mmcv/fvcore/thop).  Returns the module or
    None."""
    try:
        if load_reference() is None:
            return None
        import torch
        import torch.nn as nn

        def to_2tuple(x):
            return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std).clamp_(-2 * std, 2 * std)
            return t

        class DropPath(nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        class Registry:
            def __init__(self, name):
                pass

            def register_module(self, *a, **k):
                return lambda c: c

        if "timm" not in sys.modules:
            timm = _stub("timm")
            tm = _stub("timm.models")
            tml = _stub("timm.models.layers", {
                "DropPath": DropPath, "to_2tuple": to_2tuple,
                "trunc_normal_": trunc_normal_})
            timm.models = tm
            tm.layers = tml
        if "mmcv" not in sys.modules:
            mmcv = _stub("mmcv")
            mmcv.utils = _stub("mmcv.utils", {"Registry": Registry})
        _stub("mmcv_custom", {"load_checkpoint": lambda *a, **k: None})
        if "mmdet" not in sys.modules:
            mmdet = _stub("mmdet")
            mmdet.utils = _stub("mmdet.utils",
                                {"get_root_logger": lambda *a, **k: None})
        fv = _stub("fvcore")
        fv.nn = _stub("fvcore.nn", {"FlopCountAnalysis": object,
                                    "parameter_count_table": object})
        _stub("thop", {"profile": object})

        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_simple_panoswin",
            REFERENCE_ROOT + "/mmdet/models/backbones/simple_panoswin_transformer.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def load_reference_panoswin_v2():
    """Import the reference v-variant `panoswin_transformer.py` (torch CPU,
    the backbone the detection configs instantiate)."""
    try:
        if load_reference_panoswin() is None:
            return None
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_panoswin_v2",
            REFERENCE_ROOT + "/mmdet/models/backbones/panoswin_transformer.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def load_reference_panoswin_v1():
    """Import the reference's kept-around prior revision
    `panoswin_transformer_v1.py` (torch CPU)."""
    try:
        if load_reference_panoswin() is None:
            return None
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_panoswin_v1",
            REFERENCE_ROOT +
            "/mmdet/models/backbones/panoswin_transformer_v1.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def load_reference_swin():
    """Import the reference stock `swin_transformer.py` (torch CPU).  Its
    `from ..builder import BACKBONES` relative import can't resolve
    standalone, so the source is patched to a no-op registry."""
    try:
        if load_reference_panoswin() is None:   # installs all stubs
            return None
        import types as _t
        src = open(REFERENCE_ROOT +
                   "/mmdet/models/backbones/swin_transformer.py").read()
        src = src.replace(
            "from ..builder import BACKBONES",
            "class _R:\n"
            "    def register_module(self, *a, **k):\n"
            "        return lambda c: c\n"
            "BACKBONES = _R()")
        mod = _t.ModuleType("ref_swin")
        exec(compile(src, "ref_swin", "exec"), mod.__dict__)
        return mod
    except Exception:
        return None


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
