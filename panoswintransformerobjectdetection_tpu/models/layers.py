"""Shared flax building blocks: MLP, DropPath, patch embed/merge, norms.

Numerics match the torch reference so converted checkpoints reproduce
outputs: LayerNorm eps 1e-5, exact (erf) GELU, trunc-normal(0.02) init.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

trunc_init = jax.nn.initializers.truncated_normal(stddev=0.02)


def resolve_dtype(dtype):
    """Accepts None / jnp dtype / 'bfloat16' / 'float32' strings (config
    files carry strings)."""
    if isinstance(dtype, str):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}[dtype]
    return dtype


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5, affine)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)


def layer_norm(name: str):
    return nn.LayerNorm(epsilon=1e-5, name=name)


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2, hidden = dim * mlp_ratio (`Mlp`, reference :44)."""
    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        dt = resolve_dtype(self.dtype)
        x = nn.Dense(self.hidden_dim, kernel_init=trunc_init, dtype=dt, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(out_dim, kernel_init=trunc_init, dtype=dt, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


# Module-level override for the Pallas fused stem (tests / A-B harnesses);
# None = auto (env PANOSWIN_FUSED_STEM, else on-TPU default ON).
# TRACE-TIME CAPTURE: the flag is read while tracing, so under jax.jit the
# choice is baked into the compiled program — flipping it afterwards does
# nothing until the jit cache is cleared (or a fresh jitted callable is
# built per setting, which is what the A/B harnesses do).
USE_FUSED_STEM: Optional[bool] = None

# Single source of truth for the stem BatchNorm epsilon: used by the
# nn.BatchNorm modules on the XLA path AND by every BN fold
# (_fused_stem below, ops/stem_conv.fold_bn's default).
from ..ops.stem_conv import BN_EPS  # noqa: E402

_TRUTHY = {"1", "true", "on", "yes"}
_FALSY = {"0", "false", "off", "no"}


def _fused_stem_enabled() -> bool:
    # Default: ON on TPU devices, OFF elsewhere.  On-chip A/B
    # (tools/bench_stem_fused.py, v5e, 2026-08-18): fused Pallas stem
    # 8.59 ms vs 9.75 ms for the XLA 3-conv chain at (4, 512, 1024, 3)
    # bf16, max|diff| 0.0625 bf16.  CPU keeps the XLA convs (interpret
    # mode stays a test-only entry).
    if USE_FUSED_STEM is not None:
        return USE_FUSED_STEM
    import os
    env = os.environ.get("PANOSWIN_FUSED_STEM")
    if env is not None:
        v = env.strip().lower()
        if v in _TRUTHY:
            return True
        if v in _FALSY:
            return False
        raise ValueError(
            f"PANOSWIN_FUSED_STEM={env!r}: expected one of "
            f"{sorted(_TRUTHY | _FALSY)}")
    dev = jax.devices()[0]
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


class ConvStemPatchEmbed(nn.Module):
    """PanoSwin 3-conv patch stem: 3x3+BN+ReLU x2 then patch-stride conv
    (`PatchEmbed`, simple_panoswin_transformer.py:727-773).

    Input (B, H, W, Cin) NHWC; output (B, H/ps, W/ps, embed_dim).
    Spatial dims are zero-padded up to a multiple of patch_size first.

    Inference path (train=False) on TPU routes the two 3x3 convs through
    the fused Pallas kernel (`ops/stem_conv.py`) with BN running stats
    folded into the conv weights at trace time; parameters and the
    checkpoint tree are identical either way.
    """
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True
    dtype: Any = None
    fuse_bn: bool = False   # inference: BN pre-folded into conv weights
                            # (runtime.checkpoint.fold_batchnorm) — skip it

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = self.patch_size
        dt = resolve_dtype(self.dtype)
        if dt is not None:
            x = x.astype(dt)
        B, H, W, _ = x.shape
        if W % ps:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ps - W % ps), (0, 0)))
        if H % ps:
            x = jnp.pad(x, ((0, 0), (0, ps - H % ps), (0, 0), (0, 0)))
        d3 = self.embed_dim // 3
        conv0 = nn.Conv(d3, (3, 3), padding=1, dtype=dt, name="conv0")
        conv1 = nn.Conv(d3 * 2, (3, 3), padding=1, dtype=dt, name="conv1")
        proj = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), dtype=dt,
                       name="proj")
        fused = (not train and not self.is_initializing()
                 and ps == 4 and x.shape[-1] == 3
                 and x.shape[1] % 16 == 0 and x.shape[2] % 128 == 0
                 and _fused_stem_enabled())
        if fused:
            x = self._fused_stem(x)
        else:
            x = conv0(x)
            if not self.fuse_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=BN_EPS, name="bn0")(x)
            x = nn.relu(x)
            x = conv1(x)
            if not self.fuse_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=BN_EPS, name="bn1")(x)
            x = nn.relu(x)
            x = proj(x)
        if self.use_norm:
            x = layer_norm("norm")(x)
        if dt is not None:
            x = x.astype(dt)
        return x

    def _fused_stem(self, x):
        """Route conv0+BN+ReLU, conv1+BN+ReLU, proj through the Pallas
        fused kernel.  Reads the already-created parameters by name from
        self.variables (the conv/BN submodules are never applied on this
        path) and folds BN running stats into weight+bias at trace time."""
        from ..ops.stem_conv import stem_conv_fused
        p = self.variables["params"]

        def folded(name, bn_name):
            k = p[name]["kernel"]
            b = p[name].get("bias", jnp.zeros((k.shape[-1],), k.dtype))
            if self.fuse_bn or bn_name not in p:
                return k, b
            bnp = p[bn_name]
            bns = self.variables["batch_stats"][bn_name]
            scale = bnp["scale"] / jnp.sqrt(bns["var"] + BN_EPS)
            return k * scale, (b - bns["mean"]) * scale + bnp["bias"]

        w0, b0 = folded("conv0", "bn0")
        w1, b1 = folded("conv1", "bn1")
        wp = p["proj"]["kernel"]
        bp = p["proj"].get("bias", jnp.zeros((wp.shape[-1],), wp.dtype))
        return stem_conv_fused(x, w0, b0, w1, b1, wp, bp)


class SingleConvPatchEmbed(nn.Module):
    """Stock Swin patch embed: one patch-stride conv (+LN)
    (`swin_transformer.py` PatchEmbed)."""
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = self.patch_size
        dt = resolve_dtype(self.dtype)
        if dt is not None:
            x = x.astype(dt)
        B, H, W, _ = x.shape
        if W % ps:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ps - W % ps), (0, 0)))
        if H % ps:
            x = jnp.pad(x, ((0, 0), (0, ps - H % ps), (0, 0), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), dtype=dt, name="proj")(x)
        if self.use_norm:
            x = layer_norm("norm")(x)
        if dt is not None:
            x = x.astype(dt)
        return x


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LN -> Linear(4C, 2C) (`PatchMerging:539`).

    (B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C); odd dims zero-padded.
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = layer_norm("norm")(x)
        x = nn.Dense(2 * C, use_bias=False, kernel_init=trunc_init,
                     dtype=resolve_dtype(self.dtype), name="reduction")(x)
        return x
