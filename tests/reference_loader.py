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


def _exec_patched(relpath, modname, replacements=(), inject=None):
    """Exec a reference source file with import lines patched out and
    symbols pre-injected, registered in sys.modules so multiprocessing can
    pickle its functions by reference."""
    import types as _t
    src = open(REFERENCE_ROOT + "/" + relpath).read()
    for old, new in replacements:
        assert old in src, (relpath, old)
        src = src.replace(old, new)
    mod = _t.ModuleType(modname)
    mod.__dict__.update(inject or {})
    sys.modules[modname] = mod
    exec(compile(src, modname, "exec"), mod.__dict__)
    return mod


class _AttrDict(dict):
    """Minimal mmcv.ConfigDict: attribute access + `in` + deepcopy."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        import copy
        return _AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _torch_nms(boxes, scores, iou_threshold):
    """Exact greedy hard-NMS, transcribed from mmcv.ops.nms semantics
    (score-descending scan, suppress IoU > threshold; widths are x2-x1).
    Scalar python — test-only."""
    import torch
    order = scores.argsort(descending=True)
    keep = []
    suppressed = torch.zeros(len(order), dtype=torch.bool)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for oi in range(len(order)):
        i = order[oi].item()
        if suppressed[i]:
            continue
        keep.append(i)
        for oj in range(oi + 1, len(order)):
            j = order[oj].item()
            if suppressed[j]:
                continue
            lt = torch.maximum(boxes[i, :2], boxes[j, :2])
            rb = torch.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[0] * wh[1]
            iou = inter / (area[i] + area[j] - inter).clamp(min=1e-12)
            if iou.item() > iou_threshold:
                suppressed[j] = True
    return torch.as_tensor(keep, dtype=torch.long)


def _torch_batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    """mmcv.ops.batched_nms semantics: offset boxes per class/level id so
    groups never overlap, run plain NMS, return (dets (k, 5) score-sorted,
    keep indices)."""
    import torch
    nms_cfg = dict(nms_cfg or {})
    nms_cfg.pop("type", None)
    iou_thr = nms_cfg.get("iou_threshold", nms_cfg.get("iou_thr", 0.5))
    if boxes.numel() == 0:
        return torch.zeros((0, 5), dtype=boxes.dtype), \
            torch.zeros((0,), dtype=torch.long)
    if class_agnostic:
        boxes_for_nms = boxes
    else:
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
    keep = _torch_nms(boxes_for_nms, scores, iou_thr)
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=-1)
    return dets, keep


def load_reference_detcore():
    """Load the reference's pure-torch detection core (anchors, IoU, delta
    coder, MaxIoU assigner, RPN _get_bboxes, multiclass NMS, VOC mean_ap,
    bbox transforms) for golden parity tests.  mmcv is stubbed (its only
    uses in these files are `@mmcv.jit`, `is_tuple_of`, `is_str`,
    `print_log`, `ConfigDict`); `mmcv.ops` NMS kernels are an external CUDA
    library, transcribed above as scalar torch.  Returns a namespace or
    None."""
    try:
        import types as _t
        if load_reference() is None:
            return None

        noop_registry = (
            "class _Reg:\n"
            "    def register_module(self, *a, **k):\n"
            "        return lambda c: c\n")

        mmcv_stub = _t.ModuleType("mmcv_stub")
        mmcv_stub.jit = lambda **kw: (lambda f: f)
        mmcv_stub.is_tuple_of = lambda seq, t: isinstance(seq, tuple) and all(
            isinstance(s, t) for s in seq)
        mmcv_stub.is_str = lambda s: isinstance(s, str)
        mmcv_stub.ConfigDict = _AttrDict
        mmcv_stub.utils = _t.SimpleNamespace(
            print_log=lambda *a, **k: None)

        iou2d = _exec_patched(
            "mmdet/core/bbox/iou_calculators/iou2d_calculator.py",
            "ref_iou2d",
            [("from .builder import IOU_CALCULATORS",
              noop_registry + "IOU_CALCULATORS = _Reg()")])

        coder = _exec_patched(
            "mmdet/core/bbox/coder/delta_xywh_bbox_coder.py",
            "ref_delta_coder",
            [("import mmcv\n", ""),
             ("from ..builder import BBOX_CODERS",
              noop_registry + "BBOX_CODERS = _Reg()"),
             ("from .base_bbox_coder import BaseBBoxCoder",
              "BaseBBoxCoder = object")],
            inject={"mmcv": mmcv_stub})

        anchors = _exec_patched(
            "mmdet/core/anchor/anchor_generator.py",
            "ref_anchor_gen",
            [("import mmcv\n", ""),
             ("from .builder import ANCHOR_GENERATORS",
              noop_registry + "ANCHOR_GENERATORS = _Reg()")],
            inject={"mmcv": mmcv_stub})

        assign_result = _exec_patched(
            "mmdet/core/bbox/assigners/assign_result.py",
            "ref_assign_result",
            [("from mmdet.utils import util_mixins",
              "class util_mixins:\n"
              "    class NiceRepr:\n"
              "        pass")])

        assigner = _exec_patched(
            "mmdet/core/bbox/assigners/max_iou_assigner.py",
            "ref_max_iou_assigner",
            [("from ..builder import BBOX_ASSIGNERS",
              noop_registry + "BBOX_ASSIGNERS = _Reg()"),
             ("from ..iou_calculators import build_iou_calculator",
              "def build_iou_calculator(cfg):\n"
              "    return BboxOverlaps2D()"),
             ("from .assign_result import AssignResult", ""),
             ("from .base_assigner import BaseAssigner",
              "BaseAssigner = object")],
            inject={"AssignResult": assign_result.AssignResult,
                    "BboxOverlaps2D": iou2d.BboxOverlaps2D})

        bbox_overlaps_np = _exec_patched(
            "mmdet/core/evaluation/bbox_overlaps.py", "ref_bbox_overlaps_np")

        class _AsciiTable:
            def __init__(self, rows, *a, **k):
                self.table = "\n".join(str(r) for r in rows)
                self.inner_footing_row_border = False

        mean_ap = _exec_patched(
            "mmdet/core/evaluation/mean_ap.py",
            "ref_mean_ap",
            [("import mmcv\n", ""),
             # np.bool was removed in numpy>=1.24 — mechanical py-compat
             ("dtype=np.bool)", "dtype=bool)"),
             ("from mmcv.utils import print_log",
              "def print_log(*a, **k):\n"
              "    pass"),
             ("from terminaltables import AsciiTable", ""),
             ("from .bbox_overlaps import bbox_overlaps", ""),
             ("from .class_names import get_classes",
              "def get_classes(name):\n"
              "    return [f'c{i}' for i in range(1000)]")],
            inject={"mmcv": mmcv_stub, "AsciiTable": _AsciiTable,
                    "bbox_overlaps": bbox_overlaps_np.bbox_overlaps})

        transforms = _exec_patched(
            "mmdet/core/bbox/transforms.py", "ref_bbox_transforms")

        bbox_nms = _exec_patched(
            "mmdet/core/post_processing/bbox_nms.py",
            "ref_bbox_nms",
            [("from mmcv.ops.nms import batched_nms", ""),
             ("from mmdet.core.bbox.iou_calculators import bbox_overlaps",
              "")],
            inject={"batched_nms": _torch_batched_nms,
                    "bbox_overlaps": iou2d.bbox_overlaps})

        # PanoRPNHead._get_bboxes, bound to a namespace carrying the attrs
        # it reads (use_sigmoid_cls, bbox_coder, test_cfg).  The class's
        # AnchorHead base pulls in the full training machinery — not needed
        # for the proposal path under test.
        rpn_mod = _exec_patched(
            "mmdet/models/dense_heads/panorpn_head.py",
            "ref_panorpn",
            [("from mmcv import ConfigDict", ""),
             ("from mmcv.cnn import normal_init", "normal_init = None"),
             ("from mmcv.ops import batched_nms", ""),
             ("from ..builder import HEADS",
              noop_registry + "HEADS = _Reg()"),
             ("from .anchor_head import AnchorHead",
              "class AnchorHead:\n"
              "    def __init__(self, *a, **k):\n"
              "        pass"),
             ("from .rpn_test_mixin import RPNTestMixin",
              "class RPNTestMixin:\n"
              "    pass")],
            inject={"batched_nms": _torch_batched_nms,
                    "ConfigDict": _AttrDict})

        def rpn_get_bboxes(cls_scores, bbox_preds, mlvl_anchors, img_shapes,
                           cfg, use_sigmoid_cls=True):
            self = _t.SimpleNamespace(
                use_sigmoid_cls=use_sigmoid_cls,
                bbox_coder=coder.DeltaXYWHBBoxCoder(
                    target_means=(0., 0., 0., 0.),
                    target_stds=(1., 1., 1., 1.)),
                test_cfg=None)
            return rpn_mod.PanoRPNHead._get_bboxes(
                self, cls_scores, bbox_preds, mlvl_anchors, img_shapes,
                None, _AttrDict(cfg))

        return _t.SimpleNamespace(
            AnchorGenerator=anchors.AnchorGenerator,
            bbox_overlaps_t=iou2d.bbox_overlaps,
            BboxOverlaps2D=iou2d.BboxOverlaps2D,
            DeltaXYWHBBoxCoder=coder.DeltaXYWHBBoxCoder,
            bbox2delta=coder.bbox2delta,
            delta2bbox=coder.delta2bbox,
            MaxIoUAssigner=assigner.MaxIoUAssigner,
            bbox_overlaps_np=bbox_overlaps_np.bbox_overlaps,
            eval_map=mean_ap.eval_map,
            average_precision=mean_ap.average_precision,
            tpfp_default=mean_ap.tpfp_default,
            bbox2roi=transforms.bbox2roi,
            bbox2result=transforms.bbox2result,
            multiclass_nms=bbox_nms.multiclass_nms,
            batched_nms=_torch_batched_nms,
            nms=_torch_nms,
            rpn_get_bboxes=rpn_get_bboxes,
            PanoRPNHead=rpn_mod.PanoRPNHead,
            ConfigDict=_AttrDict,
        )
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def _torch_roi_align_single(feat, roi, out_size, spatial_scale,
                            sampling_ratio, aligned):
    """mmcv.ops.RoIAlign forward for ONE roi on ONE (C, H, W) feature map —
    scalar transcription of the CUDA kernel's documented semantics
    (aligned=True: half-pixel offset, no 1px size clamp; sampling_ratio=0:
    adaptive ceil(bin) grid; border handling: points past [-1, size] are
    zero, then clamped to the edge).  Test-only."""
    import math
    import torch
    C, H, W = feat.shape
    ph_n, pw_n = out_size
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [float(v) for v in roi]
    roi_start_w = x1 * spatial_scale - off
    roi_start_h = y1 * spatial_scale - off
    roi_w = x2 * spatial_scale - off - roi_start_w
    roi_h = y2 * spatial_scale - off - roi_start_h
    if not aligned:
        roi_w = max(roi_w, 1.0)
        roi_h = max(roi_h, 1.0)
    bin_h = roi_h / ph_n
    bin_w = roi_w / pw_n
    grid_h = sampling_ratio if sampling_ratio > 0 else \
        int(math.ceil(roi_h / ph_n))
    grid_w = sampling_ratio if sampling_ratio > 0 else \
        int(math.ceil(roi_w / pw_n))
    count = max(grid_h * grid_w, 1)
    out = torch.zeros((C, ph_n, pw_n), dtype=feat.dtype)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return torch.zeros(C, dtype=feat.dtype)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_lo = int(y)
        x_lo = int(x)
        if y_lo >= H - 1:
            y_hi = y_lo = H - 1
            y = float(y_lo)
        else:
            y_hi = y_lo + 1
        if x_lo >= W - 1:
            x_hi = x_lo = W - 1
            x = float(x_lo)
        else:
            x_hi = x_lo + 1
        ly, lx = y - y_lo, x - x_lo
        hy, hx = 1.0 - ly, 1.0 - lx
        return (feat[:, y_lo, x_lo] * hy * hx + feat[:, y_lo, x_hi] * hy * lx
                + feat[:, y_hi, x_lo] * ly * hx
                + feat[:, y_hi, x_hi] * ly * lx)

    for ph in range(ph_n):
        for pw in range(pw_n):
            acc = torch.zeros(C, dtype=feat.dtype)
            for iy in range(max(grid_h, 1)):
                y = roi_start_h + ph * bin_h + (iy + 0.5) * bin_h / max(
                    grid_h, 1)
                for ix in range(max(grid_w, 1)):
                    x = roi_start_w + pw * bin_w + (ix + 0.5) * bin_w / max(
                        grid_w, 1)
                    acc = acc + bilinear(y, x)
            out[:, ph, pw] = acc / count
    return out


def load_reference_bucketing_coder():
    """Load the reference SABL `BucketingBBoxCoder` + `bbox2bucket` /
    `bucket2bbox` (`mmdet/core/bbox/coder/bucketing_bbox_coder.py`) —
    pure torch once mmcv.jit and the registries are stubbed."""
    try:
        import types as _t
        if load_reference() is None:
            return None
        mmcv_stub = _t.ModuleType("mmcv_stub")
        mmcv_stub.jit = lambda **kw: (lambda f: f)
        transforms = _exec_patched(
            "mmdet/core/bbox/transforms.py", "ref_bbox_transforms2")
        noop_registry = (
            "class _Reg:\n"
            "    def register_module(self, *a, **k):\n"
            "        return lambda c: c\n")
        mod = _exec_patched(
            "mmdet/core/bbox/coder/bucketing_bbox_coder.py",
            "ref_bucketing_coder",
            [("import mmcv\n", ""),
             ("from ..builder import BBOX_CODERS",
              noop_registry + "BBOX_CODERS = _Reg()"),
             ("from ..transforms import bbox_rescale", ""),
             ("from .base_bbox_coder import BaseBBoxCoder",
              "BaseBBoxCoder = object")],
            inject={"mmcv": mmcv_stub,
                    "bbox_rescale": transforms.bbox_rescale})
        return mod
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def _make_torch_roi_align():
    """mmcv.ops.RoIAlign API shim (nn.Module) over the scalar
    transcription.  Built lazily so this file imports without torch."""
    import torch
    import torch.nn as nn
    import torch.nn.modules.utils as tu

    class TorchRoIAlign(nn.Module):
        def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                     pool_mode="avg", aligned=True, **kw):
            super().__init__()
            self.output_size = tu._pair(output_size)
            self.spatial_scale = spatial_scale
            self.sampling_ratio = sampling_ratio
            self.aligned = aligned

        def forward(self, feats, rois):
            N = rois.shape[0]
            C = feats.shape[1]
            out = torch.zeros((N, C, *self.output_size), dtype=feats.dtype)
            for i in range(N):
                b = int(rois[i, 0].item())
                out[i] = _torch_roi_align_single(
                    feats[b], rois[i, 1:5].tolist(), self.output_size,
                    self.spatial_scale, self.sampling_ratio, self.aligned)
            return out

    return TorchRoIAlign


def load_reference_detstack():
    """Load the reference's torch FPN, SingleRoIExtractor and
    Shared2FCBBoxHead for end-to-end forward parity.  mmcv.cnn.ConvModule
    degrades to a plain conv (FPN passes norm_cfg=act_cfg=None);
    mmcv.ops.RoIAlign is the scalar transcription above.  Returns a
    namespace or None."""
    try:
        import types as _t
        core = load_reference_detcore()
        if core is None:
            return None
        import torch
        import torch.nn as nn

        class ConvModule(nn.Module):
            """conv(+ReLU) stand-in for mmcv.cnn.ConvModule with
            norm_cfg=None (bias='auto' -> True), as the FPN/ConvFC heads
            construct it."""

            def __init__(self, in_c, out_c, k, stride=1, padding=0,
                         dilation=1, groups=1, bias="auto", conv_cfg=None,
                         norm_cfg=None, act_cfg=None, inplace=True, **kw):
                super().__init__()
                assert norm_cfg is None, "stub only supports norm_cfg=None"
                if act_cfg is not None and act_cfg != dict(type="ReLU"):
                    raise NotImplementedError(act_cfg)
                self.with_act = act_cfg is not None
                self.conv = nn.Conv2d(in_c, out_c, k, stride=stride,
                                      padding=padding, dilation=dilation,
                                      groups=groups, bias=True)

            def forward(self, x):
                x = self.conv(x)
                if self.with_act:
                    x = torch.relu(x)
                return x

        def identity_deco(*a, **k):
            def wrap(f):
                return f
            return wrap

        noop_registry = (
            "class _Reg:\n"
            "    def register_module(self, *a, **k):\n"
            "        return lambda c: c\n")

        fpn = _exec_patched(
            "mmdet/models/necks/fpn.py", "ref_fpn",
            [("from mmcv.cnn import ConvModule, xavier_init", ""),
             ("from mmcv.runner import auto_fp16", ""),
             ("from ..builder import NECKS",
              noop_registry + "NECKS = _Reg()")],
            inject={"ConvModule": ConvModule,
                    "xavier_init": lambda *a, **k: None,
                    "auto_fp16": identity_deco})

        TorchRoIAlign = _make_torch_roi_align()
        ops_ns = _t.SimpleNamespace(RoIAlign=TorchRoIAlign)
        base_ext = _exec_patched(
            "mmdet/models/roi_heads/roi_extractors/base_roi_extractor.py",
            "ref_base_roi_extractor",
            [("from mmcv import ops", "")],
            inject={"ops": ops_ns})
        single_ext = _exec_patched(
            "mmdet/models/roi_heads/roi_extractors/"
            "single_level_roi_extractor.py",
            "ref_single_roi_extractor",
            [("from mmcv.runner import force_fp32", ""),
             ("from mmdet.models.builder import ROI_EXTRACTORS",
              noop_registry + "ROI_EXTRACTORS = _Reg()"),
             ("from .base_roi_extractor import BaseRoIExtractor", "")],
            inject={"force_fp32": identity_deco,
                    "BaseRoIExtractor": base_ext.BaseRoIExtractor})

        def build_bbox_coder(cfg):
            cfg = dict(cfg)
            assert cfg.pop("type") == "DeltaXYWHBBoxCoder"
            return core.DeltaXYWHBBoxCoder(**cfg)

        bbox_head = _exec_patched(
            "mmdet/models/roi_heads/bbox_heads/bbox_head.py",
            "ref_bbox_head",
            [("from mmcv.runner import auto_fp16, force_fp32", ""),
             ("from mmdet.core import build_bbox_coder, multi_apply, "
              "multiclass_nms", ""),
             ("from mmdet.models.builder import HEADS, build_loss",
              noop_registry + "HEADS = _Reg()"),
             ("from mmdet.models.losses import accuracy", "")],
            inject={"auto_fp16": identity_deco, "force_fp32": identity_deco,
                    "build_bbox_coder": build_bbox_coder,
                    "multi_apply": None, "accuracy": None,
                    "build_loss": lambda cfg: None,
                    "multiclass_nms": core.multiclass_nms})

        convfc = _exec_patched(
            "mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py",
            "ref_convfc_bbox_head",
            [("from mmcv.cnn import ConvModule", ""),
             ("from mmdet.models.builder import HEADS",
              noop_registry + "HEADS = _Reg()"),
             ("from .bbox_head import BBoxHead", "")],
            inject={"ConvModule": ConvModule,
                    "BBoxHead": bbox_head.BBoxHead})

        return _t.SimpleNamespace(
            core=core,
            FPN=fpn.FPN,
            SingleRoIExtractor=single_ext.SingleRoIExtractor,
            BBoxHead=bbox_head.BBoxHead,
            Shared2FCBBoxHead=convfc.Shared2FCBBoxHead,
            RoIAlign=TorchRoIAlign,
        )
    except Exception:
        import traceback
        traceback.print_exc()
        return None


def load_reference_basketball():
    """Import the reference `basketball_transform_torchcuda.py` (torch CPU:
    correct_center / get_v_all_patches / stb_adj_info)."""
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_basketball",
            REFERENCE_ROOT + "/lzx/lzx_augs/basketball_transform_torchcuda.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
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
