"""Checkpointing: orbax state save/restore + PyTorch checkpoint conversion.

The converter replicates the reference's Swin-aware loader semantics
(`mmcv_custom/checkpoint.py`): `module.` prefix stripping, absolute
position embedding reshape (:327-334), and bicubic interpolation of
relative-position bias tables across window sizes (:336-352) — applied to
the PanoSwin alpha/beta tables as well — while additionally translating
layouts torch->flax: Linear (out,in)->(in,out), Conv OIHW->HWIO,
LayerNorm weight->scale, BatchNorm stats -> the `batch_stats` collection,
and channel-first fc flattening -> channel-last.
"""

import math
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------- orbax
def save_checkpoint(path: str, state, step: Optional[int] = None):
    import orbax.checkpoint as ocp
    import jax
    ckpt = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(ckpt), force=True)


def load_checkpoint(path: str, state):
    import orbax.checkpoint as ocp
    import jax
    ckptr = ocp.PyTreeCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    restored = ckptr.restore(path, item=jax.device_get(template))
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


# ------------------------------------------------------------ torch -> flax
def _strip_module(sd: Dict[str, Any]) -> Dict[str, Any]:
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _linear(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _bn(sd, prefix):
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def resize_bias_table(table: np.ndarray, src_ws: int, dst_ws: int) -> np.ndarray:
    """Bicubic resize of a ((2w-1)^2, heads) relative bias table across
    window sizes (`mmcv_custom/checkpoint.py:336-352`)."""
    if src_ws == dst_ws:
        return table
    t, h = table.shape
    s = 2 * src_ws - 1
    d = 2 * dst_ws - 1
    from ..geometry.resample import _torch_cubic_weights
    # torch-exact bicubic, host-side (matches F.interpolate in
    # `mmcv_custom/checkpoint.py:336-352`)
    img = np.asarray(table, np.float64).reshape(s, s, h)
    wh = _torch_cubic_weights(d, s)
    out = np.einsum("oh,hwc->owc", wh, img)
    out = np.einsum("ow,hwc->hoc", wh, out)
    return out.reshape(d * d, h).astype(np.asarray(table).dtype)


def convert_panoswin_backbone(sd: Dict[str, Any], depths, window_size: int = 7,
                              src_window_size: Optional[int] = None
                              ) -> Tuple[dict, dict]:
    """Reference `SimplePanoSwinTransformer` state_dict -> (params, batch_stats)
    trees for `models.panoswin.PanoSwinTransformer`."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    pe_params = {
        "conv0": _conv(sd, "patch_embed.proj.0"),
        "conv1": _conv(sd, "patch_embed.proj.3"),
        "proj": _conv(sd, "patch_embed.proj.6"),
    }
    pe_stats = {}
    pe_params["bn0"], pe_stats["bn0"] = _bn(sd, "patch_embed.proj.1")
    pe_params["bn1"], pe_stats["bn1"] = _bn(sd, "patch_embed.proj.4")
    if "patch_embed.norm.weight" in sd:
        pe_params["norm"] = _ln(sd, "patch_embed.norm")
    params["patch_embed"] = pe_params
    stats["patch_embed"] = pe_stats

    if "abs_encoder.weight" in sd:
        params["abs_encoder"] = _linear(sd, "abs_encoder")

    def table(prefix, name):
        t = _np(sd[prefix + name])
        if src_window_size:
            t = resize_bias_table(t, src_window_size, window_size)
        return t

    for i, depth in enumerate(depths):
        layer: Dict[str, Any] = {}
        depth_swin = depth - depth % 2
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            blk: Dict[str, Any] = {
                "norm1": _ln(sd, p + ".norm1"),
                "norm2": _ln(sd, p + ".norm2"),
                "mlp": {"fc1": _linear(sd, p + ".mlp.fc1"),
                        "fc2": _linear(sd, p + ".mlp.fc2")},
            }
            if j < depth_swin:
                blk["attn"] = {
                    "qkv": _linear(sd, p + ".attn.qkv"),
                    "proj": _linear(sd, p + ".attn.proj"),
                    "alpha_table": table(p, ".attn.sphere_position_alpha_table_Te"),
                    "beta_table": table(p, ".attn.sphere_position_beta_table_Te"),
                }
            else:  # pitch attention block (flat params on the module)
                blk.update({
                    "q_linear": _linear(sd, p + ".q_linear"),
                    "k_linear": _linear(sd, p + ".k_linear"),
                    "v_linear": _linear(sd, p + ".v_linear"),
                    "proj": _linear(sd, p + ".proj"),
                    "alpha_table": table(p, ".sphere_position_alpha_table_Te"),
                    "beta_table": table(p, ".sphere_position_beta_table_Te"),
                })
            layer[f"blocks_{j}"] = blk
        if f"layers.{i}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _np(
                    sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
        params[f"layers_{i}"] = layer

    for i in range(len(depths)):
        if f"norm{i}.weight" in sd:
            params[f"norm{i}"] = _ln(sd, f"norm{i}")
    return params, stats


def convert_swin_backbone(sd: Dict[str, Any], depths, window_size: int = 7,
                          src_window_size: Optional[int] = None,
                          embed_dim: int = 96) -> Tuple[dict, dict]:
    """Stock `swin_transformer.py` state_dict -> flax `SwinTransformer` tree."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    params["patch_embed"] = {"proj": _conv(sd, "patch_embed.proj")}
    if "patch_embed.norm.weight" in sd:
        params["patch_embed"]["norm"] = _ln(sd, "patch_embed.norm")
    if "absolute_pos_embed" in sd:
        ape = _np(sd["absolute_pos_embed"])    # (1, L, C) or (1, C, H, W)
        if ape.ndim == 4:
            ape = ape.transpose(0, 2, 3, 1)
        else:
            L = ape.shape[1]
            s = int(math.isqrt(L))
            ape = ape.reshape(1, s, s, -1)
        params["absolute_pos_embed"] = ape

    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            t = _np(sd[p + ".attn.relative_position_bias_table"])
            if src_window_size:
                t = resize_bias_table(t, src_window_size, window_size)
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": _ln(sd, p + ".norm1"),
                "norm2": _ln(sd, p + ".norm2"),
                "attn": {
                    "qkv": _linear(sd, p + ".attn.qkv"),
                    "proj": _linear(sd, p + ".attn.proj"),
                    "relative_position_bias_table": t,
                },
                "mlp": {"fc1": _linear(sd, p + ".mlp.fc1"),
                        "fc2": _linear(sd, p + ".mlp.fc2")},
            }
        if f"layers.{i}.downsample.reduction.weight" in sd:
            params[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _np(
                    sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
    for i in range(len(depths)):
        if f"norm{i}.weight" in sd:
            params[f"norm{i}"] = _ln(sd, f"norm{i}")
    return params, {}


def _fc_from_chw(sd, prefix, spatial=7):
    """torch fc over a flattened (C, h, w) roi feature -> flax fc over
    (h, w, C): permute the input-dim ordering of the weight."""
    w = _np(sd[prefix + ".weight"])            # (out, C*h*w) channel-first
    out_dim, in_dim = w.shape
    c = in_dim // (spatial * spatial)
    w = w.reshape(out_dim, c, spatial, spatial).transpose(0, 2, 3, 1)
    w = w.reshape(out_dim, in_dim).T
    return {"kernel": w, "bias": _np(sd[prefix + ".bias"])}


def convert_detector(sd: Dict[str, Any], depths, window_size: int = 7,
                     backbone: str = "panoswin",
                     src_window_size: Optional[int] = None) -> Tuple[dict, dict]:
    """Full two-stage detector state_dict -> detector variables tree."""
    sd = _strip_module(sd)
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    if backbone == "panoswin":
        bb_params, bb_stats = convert_panoswin_backbone(
            bb_sd, depths, window_size, src_window_size)
    else:
        bb_params, bb_stats = convert_swin_backbone(
            bb_sd, depths, window_size, src_window_size)

    neck = {}
    i = 0
    while f"neck.lateral_convs.{i}.conv.weight" in sd:
        neck[f"lateral_{i}"] = _conv(sd, f"neck.lateral_convs.{i}.conv")
        neck[f"fpn_{i}"] = _conv(sd, f"neck.fpn_convs.{i}.conv")
        i += 1

    rpn = {
        "rpn_conv": _conv(sd, "rpn_head.rpn_conv"),
        "rpn_cls": _conv(sd, "rpn_head.rpn_cls"),
        "rpn_reg": _conv(sd, "rpn_head.rpn_reg"),
    }

    bbox_head = {
        "shared_fc0": _fc_from_chw(sd, "roi_head.bbox_head.shared_fcs.0"),
        "shared_fc1": _linear(sd, "roi_head.bbox_head.shared_fcs.1"),
        "fc_cls": _linear(sd, "roi_head.bbox_head.fc_cls"),
        "fc_reg": _linear(sd, "roi_head.bbox_head.fc_reg"),
    }

    params = {"backbone_m": bb_params, "neck_m": neck, "rpn_m": rpn,
              "bbox_head_m": bbox_head}
    stats = {"backbone_m": bb_stats} if bb_stats else {}
    return params, stats


# torchvision:// names the reference loader resolves through the
# torchvision model zoo (`mmcv_custom/checkpoint.py:240-300` multi-source
# dispatch: file / http(s) / torchvision / pavi / s3).
TORCHVISION_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-63fe2227.pth",
    "resnext101_32x8d":
        "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
}


def _cache_dir() -> str:
    d = os.environ.get("TORCH_HOME") or os.path.expanduser("~/.cache/torch")
    d = os.path.join(d, "checkpoints")
    os.makedirs(d, exist_ok=True)
    return d


def resolve_checkpoint(path: str) -> str:
    """Multi-source checkpoint resolution
    (`mmcv_custom/checkpoint.py:240-300`): plain file paths pass through;
    `torchvision://<name>` maps to the model-zoo URL; `http(s)://` URLs
    download once into the torch cache dir and return the local path."""
    if path.startswith("torchvision://"):
        name = path[len("torchvision://"):]
        if name not in TORCHVISION_URLS:
            raise KeyError(f"unknown torchvision model {name!r}; known: "
                           f"{sorted(TORCHVISION_URLS)}")
        path = TORCHVISION_URLS[name]
    if path.startswith(("http://", "https://")):
        import urllib.request
        local = os.path.join(_cache_dir(), os.path.basename(path))
        if not os.path.exists(local):
            tmp = local + ".part"
            urllib.request.urlretrieve(path, tmp)
            os.replace(tmp, local)
        return local
    return path


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint from a file path, URL, or torchvision://
    source and return its state_dict."""
    import torch
    path = resolve_checkpoint(path)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    return ckpt


def convert_panoswin_v2_backbone(sd: Dict[str, Any], depths,
                                 window_size: int = 7,
                                 src_window_size: Optional[int] = None
                                 ) -> Tuple[dict, dict]:
    """Reference v-variant `panoswin_transformer.py` state_dict ->
    (params, batch_stats) for `models.panoswin_v2.PanoSwinTransformerV2`."""
    sd = _strip_module(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    pe_stats = {}
    if "patch_embed.proj.pos_embedding" in sd:
        # emb_conv_type='tf': PixelTransformer (`panoswin_transformer.py:739`)
        # — only the uv_mask=None path's params map (preprocess / the uv
        # branch is unreachable from PatchEmbed.forward:851)
        p = "patch_embed.proj."
        pe = {"proj": {
            "preprocess_nouv": _linear(sd, p + "preprocess_nouv.0"),
            "pos_embedding": _np(sd[p + "pos_embedding"]),
            "in_proj_weight": _np(
                sd[p + "encoder.layers.0.self_attn.in_proj_weight"]),
            "in_proj_bias": _np(
                sd[p + "encoder.layers.0.self_attn.in_proj_bias"]),
            "out_proj": _linear(sd, p + "encoder.layers.0.self_attn.out_proj"),
            "linear1": _linear(sd, p + "encoder.layers.0.linear1"),
            "linear2": _linear(sd, p + "encoder.layers.0.linear2"),
            "norm1": _ln(sd, p + "encoder.layers.0.norm1"),
            "norm2": _ln(sd, p + "encoder.layers.0.norm2"),
        }}
    else:
        pe = {
            "conv0": _conv(sd, "patch_embed.proj.0"),
            "conv1": _conv(sd, "patch_embed.proj.3"),
            "proj": _conv(sd, "patch_embed.proj.6"),
        }
        pe["bn0"], pe_stats["bn0"] = _bn(sd, "patch_embed.proj.1")
        pe["bn1"], pe_stats["bn1"] = _bn(sd, "patch_embed.proj.4")
    if "patch_embed.norm.weight" in sd:
        pe["norm"] = _ln(sd, "patch_embed.norm")
    params["patch_embed"] = pe
    stats["patch_embed"] = pe_stats

    if "coord_encoder.weight" in sd:
        params["coord_encoder"] = _linear(sd, "coord_encoder")

    def table(name):
        t = _np(sd[name])
        if src_window_size:
            t = resize_bias_table(t, src_window_size, window_size)
        return t

    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            params[f"layers_{i}_blocks_{j}"] = {
                "norm1": _ln(sd, p + ".norm1"),
                "norm2": _ln(sd, p + ".norm2"),
                "attn": {
                    "qkv": _linear(sd, p + ".attn.qkv"),
                    "proj": _linear(sd, p + ".attn.proj"),
                    "relative_position_bias_table":
                        table(p + ".attn.relative_position_bias_table"),
                    "alpha_table": table(p + ".attn.sphere_position_alpha_table"),
                    "beta_table": table(p + ".attn.sphere_position_beta_table"),
                },
                "mlp": {"fc1": _linear(sd, p + ".mlp.fc1"),
                        "fc2": _linear(sd, p + ".mlp.fc2")},
            }
        if f"layers.{i}.downsample.reduction.weight" in sd:
            params[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": _np(
                    sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
    for i in range(len(depths)):
        if f"norm{i}.weight" in sd:
            params[f"norm{i}"] = _ln(sd, f"norm{i}")
    return params, stats


# The v1 revision (`panoswin_transformer_v1.py`) shares every parameter
# name and shape with the v-variant (same stem, tables, block modules;
# only forward semantics differ), so its converter is the same function.
convert_panoswin_v1_backbone = convert_panoswin_v2_backbone


def fold_batchnorm(params: Dict[str, Any], batch_stats: Dict[str, Any],
                   eps: float = 1e-5) -> Tuple[dict, dict]:
    """Fold eval-mode BatchNorm into the preceding conv for inference.

    For every module containing conv `<name>` followed by bn `bn<name
    suffix>` (the `conv0/bn0`, `conv1/bn1` stem convention and ResNet's
    `conv_i/bn_i`): W' = W * g/s, b' = beta + (b - mean) * g/s with
    s = sqrt(var + eps); the BN is left with identity params so the module
    graph is unchanged.  Returns new (params, batch_stats).
    """
    import copy
    import jax
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def walk(p, s):
        if not isinstance(p, dict):
            return
        for key in list(p.keys()):
            if key.startswith("bn") and isinstance(s, dict) and key in s:
                conv_key = "conv" + key[2:]
                if conv_key not in p and key[2:].isdigit() is False:
                    conv_key = key.replace("bn", "conv", 1)
                if conv_key in p and "kernel" in p[conv_key]:
                    g = p[key]["scale"]
                    b = p[key]["bias"]
                    mean = s[key]["mean"]
                    var = s[key]["var"]
                    f = g / np.sqrt(var + eps)
                    p[conv_key]["kernel"] = p[conv_key]["kernel"] * f
                    cb = p[conv_key].get("bias", np.zeros_like(b))
                    p[conv_key]["bias"] = b + (cb - mean) * f
                    p[key]["scale"] = np.ones_like(g)
                    p[key]["bias"] = np.zeros_like(b)
                    s[key]["mean"] = np.zeros_like(mean)
                    s[key]["var"] = np.ones_like(var) - eps
        for key, v in p.items():
            if isinstance(v, dict):
                walk(v, s.get(key, {}) if isinstance(s, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats


# --------------------------------------------------- CNN backbone converters
def convert_resnet_backbone(sd: Dict[str, Any], depth: int
                            ) -> Tuple[dict, dict]:
    """torchvision / mmdet-style ResNet(-eXt) state_dict -> (params,
    batch_stats) for `models.resnet.ResNet` (the `torchvision://resnetNN`
    sources of `mmcv_custom/checkpoint.py:240-300`; also the output format
    of `tools/model_converters/detectron2pytorch.py`)."""
    sd = _strip_module(sd)
    if any(k.startswith("backbone.") for k in sd):
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
    from ..models.resnet import ARCH
    _, depths = ARCH[depth]
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for i, d in enumerate(depths):
        for j in range(d):
            src, dst = f"layer{i + 1}.{j}", f"layer{i + 1}_{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for n in (1, 2, 3):
                if f"{src}.conv{n}.weight" not in sd:
                    continue
                bp[f"conv{n}"] = _conv(sd, f"{src}.conv{n}")
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn(sd, f"{src}.bn{n}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{src}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            params[dst], stats[dst] = bp, bs
    return params, stats


def convert_regnet_backbone(sd: Dict[str, Any], arch: str
                            ) -> Tuple[dict, dict]:
    """pycls RegNet `model_state` -> (params, batch_stats) for
    `models.backbones_extra.RegNet` (the mapping of
    `tools/model_converters/regnet2mmdet.py`: stem.conv->conv1,
    s{i}.b{j}.f.{a,b,c}->conv{1,2,3}, .proj->downsample)."""
    sd = _strip_module(sd)
    from ..models.backbones_extra import REGNET_ARCH
    cfg = REGNET_ARCH[arch]
    params: Dict[str, Any] = {"conv1": _conv(sd, "stem.conv")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, "stem.bn")
    for i, d in enumerate(cfg["depths"]):
        for j in range(d):
            src, dst = f"s{i + 1}.b{j + 1}", f"layer{i + 1}_{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for sub, n in (("a", 1), ("b", 2), ("c", 3)):
                bp[f"conv{n}"] = _conv(sd, f"{src}.f.{sub}")
                bp[f"bn{n}"], bs[f"bn{n}"] = _bn(sd, f"{src}.f.{sub}_bn")
            if f"{src}.proj.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{src}.proj")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{src}.bn")
            params[dst], stats[dst] = bp, bs
    return params, stats
