"""Feature Pyramid Network (`mmdet/models/necks/fpn.py:12` semantics).

Lateral 1x1 convs -> top-down nearest upsample + add -> 3x3 output convs;
extra pyramid levels from stride-2 max-pooling of the last output (the
Faster R-CNN `num_outs=5`, `add_extra_convs=False` configuration).  NHWC.
Nearest upsampling uses floor-index gather to match
`F.interpolate(mode='nearest')` exactly.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import resolve_dtype
from .registry import NECKS


def nearest_upsample(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(B, h, w, C) -> (B, out_h, out_w, C), torch-nearest index mapping.

    Exact integer scale (every FPN top-down step) is a broadcast+reshape —
    a pure layout op.  The general case uses one-hot matmuls instead of a
    gather: XLA lowers big gathers to a serial scalar loop on this TPU
    backend (measured ~30 MB/s), while 0/1 selection matrices run on the
    MXU.  Both reproduce `F.interpolate(mode='nearest')` exactly."""
    B, h, w, C = x.shape
    if out_h % h == 0 and out_w % w == 0:
        ry, rx = out_h // h, out_w // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, h, ry, w, rx, C))
        return x.reshape(B, out_h, out_w, C)
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    Py = jnp.asarray(np.eye(h, dtype=np.float32)[iy], x.dtype)   # (out_h, h)
    Px = jnp.asarray(np.eye(w, dtype=np.float32)[ix], x.dtype)   # (out_w, w)
    x = jnp.einsum("oh,bhwc->bowc", Py, x)
    return jnp.einsum("ow,bhwc->bhoc", Px, x)


def max_pool_s2(x: jnp.ndarray) -> jnp.ndarray:
    """1x1 kernel stride-2 max pool (mmdet uses F.max_pool2d(x, 1, stride=2))."""
    return x[:, ::2, ::2, :]


@NECKS.register
class Identity(nn.Module):
    """Pass-through neck for neck-less layouts (the reference's C4/DC5
    configs set `neck=None`, e.g.
    configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_1x_coco.py)."""
    @nn.compact
    def __call__(self, feats):
        return tuple(feats)


@NECKS.register
class FPN(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: bool = False
    relu_before_extra_convs: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        """feats: tuple of NHWC maps, len == len(in_channels)."""
        assert len(feats) == len(self.in_channels)
        dt = resolve_dtype(self.dtype)
        used = feats[self.start_level:]
        if dt is not None:
            used = [f.astype(dt) for f in used]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt, name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + nearest_upsample(laterals[i], h, w)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt, name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        if self.num_outs > len(outs):
            if not self.add_extra_convs:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(max_pool_s2(outs[-1]))
            else:
                extra_src = used[-1]
                for i in range(self.num_outs - len(outs)):
                    src = outs[-1] if i > 0 else extra_src
                    if self.relu_before_extra_convs and i > 0:
                        src = nn.relu(src)
                    outs.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                        padding=1, dtype=dt, name=f"extra_{i}")(src))
        return tuple(outs)


@NECKS.register
class PAFPN(FPN):
    """Path-Aggregation FPN (`mmdet/models/necks/pafpn.py`): FPN top-down
    pass followed by an extra bottom-up path with stride-2 downsample convs."""

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.in_channels)
        dt = resolve_dtype(self.dtype)
        used = feats[self.start_level:]
        if dt is not None:
            used = [f.astype(dt) for f in used]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt, name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + nearest_upsample(laterals[i], h, w)
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                    name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        # bottom-up augmentation
        outs = [inter[0]]
        for i in range(1, len(inter)):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                           dtype=dt, name=f"downsample_{i - 1}")(outs[-1])
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                                name=f"pafpn_{i - 1}")(down + inter[i]))
        if self.num_outs > len(outs):
            for _ in range(self.num_outs - len(outs)):
                outs.append(max_pool_s2(outs[-1]))
        return tuple(outs)


def _resize_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Merge-cell input resize (`mmcv.ops.merge_cells.BaseMergeCell._resize`):
    nearest upsample when the target is larger, strided max-pool when smaller.
    """
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] < h:
        return nearest_upsample(x, h, w)
    kh, kw = x.shape[1] // h, x.shape[2] // w
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class _MergeOut(nn.Module):
    """Merge-cell output conv: act -> 3x3 conv (mmcv out_conv_order)."""
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype)(nn.relu(x))


def _gp_merge(x1, x2):
    """GlobalPoolingCell binary op: x2 + sigmoid(GAP(x2)) * x1."""
    att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
    return x2 + att * x1


@NECKS.register
class NASFPN(nn.Module):
    """NAS-FPN (`mmdet/models/necks/nas_fpn.py:9`): laterals + pooled extras
    to 5 levels, then `stack_times` copies of the discovered merging-cell
    topology (gp_64_4 / sum_44_4 / ... / gp_75_6)."""
    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        dt = resolve_dtype(self.dtype)
        used = feats[self.start_level:]
        if dt is not None:
            used = [f.astype(dt) for f in used]
        levels = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt, name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        for i in range(self.num_outs - len(levels)):
            x = nn.Conv(self.out_channels, (1, 1), dtype=dt,
                        name=f"extra_{i}")(levels[-1])
            levels.append(nn.max_pool(x, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = levels

        def size(p):
            return p.shape[1], p.shape[2]

        for s in range(self.stack_times):
            def out(x, name):
                return _MergeOut(self.out_channels, dtype=dt,
                                 name=f"stage{s}_{name}")(x)
            p4_1 = out(_gp_merge(_resize_to(p6, *size(p4)), p4), "gp_64_4")
            p4_2 = out(p4_1 + p4, "sum_44_4")
            p3 = out(_resize_to(p4_2, *size(p3)) + p3, "sum_43_3")
            p4 = out(_resize_to(p3, *size(p4)) + p4_2, "sum_34_4")
            p5_tmp = _gp_merge(_resize_to(p4, *size(p5)),
                               _resize_to(p3, *size(p5)))
            p5 = out(p5 + p5_tmp, "sum_55_5")
            p7_tmp = _gp_merge(_resize_to(p5, *size(p7)),
                               _resize_to(p4_2, *size(p7)))
            p7 = out(p7 + p7_tmp, "sum_77_7")
            p6 = out(_gp_merge(_resize_to(p7, *size(p6)),
                               _resize_to(p5, *size(p6))), "gp_75_6")
        return (p3, p4, p5, p6, p7)


@NECKS.register
class FPN_CARAFE(nn.Module):
    """FPN whose top-down upsampling is CARAFE content-aware reassembly
    (`mmdet/models/necks/fpn_carafe.py`, configs/carafe).  Same lateral /
    output conv topology as FPN; extra levels from max-pool."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    upsample_kernel: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        from ..ops.carafe import CARAFEPack
        dt = resolve_dtype(self.dtype)
        used = feats[self.start_level:]
        if dt is not None:
            used = [f.astype(dt) for f in used]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt, name=f"lateral_{i}")(f)
            for i, f in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEPack(up=2, k=self.upsample_kernel,
                            name=f"carafe_{i}")(laterals[i])
            laterals[i - 1] = laterals[i - 1] + up[:, :laterals[i - 1].shape[1],
                                                   :laterals[i - 1].shape[2]]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                    name=f"fpn_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        while len(outs) < self.num_outs:
            outs.append(max_pool_s2(outs[-1]))
        return tuple(outs)


@NECKS.register
class BFP(nn.Module):
    """Balanced Feature Pyramid (`mmdet/models/necks/bfp.py`, Libra R-CNN):
    gather all levels to the refine level, average, refine with a conv
    (or embedded-gaussian non-local attention, the reference recipe's
    `refine_type='non_local'` -> mmcv NonLocal2d), scatter the residual
    back to every level."""
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = "conv"   # "conv" | "non_local"
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == self.num_levels
        dt = resolve_dtype(self.dtype)
        rh, rw = feats[self.refine_level].shape[1:3]
        gathered = []
        for i, f in enumerate(feats):
            if dt is not None:
                f = f.astype(dt)
            if i < self.refine_level:
                k = feats[i].shape[1] // rh
                f = nn.max_pool(f, (k, k), strides=(k, k))
            elif i > self.refine_level:
                f = nearest_upsample(f, rh, rw)
            gathered.append(f)
        bsf = sum(gathered) / self.num_levels
        if self.refine_type == "non_local":
            # NonLocal2d embedded-gaussian (`mmcv/cnn/bricks/non_local.py`):
            # theta/phi/g 1x1 convs at C/2, softmax attention over all
            # positions, out-conv residual — pure batched GEMMs, no gathers
            Bn, H, W, C = bsf.shape
            mid = max(C // 2, 1)
            theta = nn.Conv(mid, (1, 1), dtype=dt, name="nl_theta")(bsf)
            phi = nn.Conv(mid, (1, 1), dtype=dt, name="nl_phi")(bsf)
            g = nn.Conv(mid, (1, 1), dtype=dt, name="nl_g")(bsf)
            q = theta.reshape(Bn, H * W, mid)
            kk = phi.reshape(Bn, H * W, mid)
            v = g.reshape(Bn, H * W, mid)
            attn = jax.nn.softmax(
                jnp.einsum("bqc,bkc->bqk", q, kk).astype(jnp.float32), -1)
            y = jnp.einsum("bqk,bkc->bqc", attn.astype(q.dtype), v)
            y = y.reshape(Bn, H, W, mid)
            bsf = bsf + nn.Conv(C, (1, 1), dtype=dt,
                                kernel_init=nn.initializers.zeros,
                                name="nl_out")(y)
        else:
            bsf = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=dt,
                          name="refine")(bsf)
        outs = []
        for i, f in enumerate(feats):
            h, w = f.shape[1:3]
            if i < self.refine_level:
                r = nearest_upsample(bsf, h, w)
            elif i > self.refine_level:
                k = rh // h
                r = nn.max_pool(bsf, (k, k), strides=(k, k))
            else:
                r = bsf
            outs.append(f + r.astype(f.dtype))
        return tuple(outs)
