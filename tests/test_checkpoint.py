"""Checkpoint conversion + golden feature parity vs the reference PanoSwin.

The strongest correctness check in the suite: the actual reference
`SimplePanoSwinTransformer` (torch CPU, heavy deps stubbed) is run on a
random image, its state_dict converted to flax, and our backbone must
reproduce the per-stage features (BASELINE config 3 protocol).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.models.panoswin import PanoSwinTransformer
from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
    convert_panoswin_backbone, resize_bias_table,
)
from reference_loader import load_reference_panoswin

REF = load_reference_panoswin()

CFG = dict(patch_size=4, embed_dim=6, depths=(2, 2), num_heads=(1, 2),
           window_size=4, ape=True, out_indices=(0, 1), drop_path_rate=0.0)


def _build_pair(pano_mode, depths=(2, 2)):
    import torch
    torch.manual_seed(0)
    cfg = dict(CFG, depths=depths)
    ref = REF.SimplePanoSwinTransformer(
        patch_size=cfg["patch_size"], in_chans=3, embed_dim=cfg["embed_dim"],
        depths=list(depths), num_heads=list(cfg["num_heads"]),
        window_size=cfg["window_size"], ape=True, pano_mode=pano_mode,
        out_indices=tuple(cfg["out_indices"]), drop_path_rate=0.0)
    ref.eval()
    params, stats = convert_panoswin_backbone(
        ref.state_dict(), depths, window_size=cfg["window_size"])
    ours = PanoSwinTransformer(pano_mode=pano_mode, in_chans=3, **cfg)
    return ref, ours, {"params": params, "batch_stats": stats}


@pytest.mark.skipif(REF is None, reason="reference panoswin unavailable")
class TestPanoSwinParity:
    @pytest.mark.parametrize("pano", [False, True])
    def test_feature_parity(self, rng, pano):
        import torch
        ref, ours, variables = _build_pair(pano)
        x = rng.random((1, 3, 32, 64)).astype(np.float32)
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x))
        our_outs = ours.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)))
        assert len(ref_outs) == len(our_outs)
        for r, o in zip(ref_outs, our_outs):
            r = r.numpy()                       # (B, C, H, W)
            o = np.moveaxis(np.asarray(o), -1, 1)
            assert r.shape == o.shape, (r.shape, o.shape)
            err = np.abs(r - o).max()
            assert err < 2e-4, f"max err {err} (pano={pano})"

    def test_pitch_attention_parity(self, rng):
        """The reference's pitch attention crashes as-is
        (`simple_panoswin_transformer.py:1038` passes `with_uv=True`, which
        `lzx/pano_rotate.py:169` does not accept — SURVEY.md §7).  We shim
        the intended call (rotate the feature+uv channel stack, discard the
        extra returns) and compare against our implementation of the
        intended behavior."""
        import torch
        orig = REF.pano_rotate_image

        def shim(bcwh, np_uv, with_uv=False):
            out, _ = orig(bcwh, np_uv)
            return out, None, None

        REF.pano_rotate_image = shim
        try:
            ref, ours, variables = _build_pair(True, depths=(3, 2))
        finally:
            pass
        x = rng.random((1, 3, 32, 64)).astype(np.float32)
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x))
        our_outs = ours.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)))
        for r, o in zip(ref_outs, our_outs):
            err = np.abs(r.numpy() - np.moveaxis(np.asarray(o), -1, 1)).max()
            assert err < 2e-3, f"pitch parity err {err}"


class TestBiasTableResize:
    def test_identity(self, rng):
        t = rng.random((49, 3)).astype(np.float32)
        np.testing.assert_array_equal(resize_bias_table(t, 4, 4), t)

    def test_resize_shape(self, rng):
        t = rng.random((169, 4)).astype(np.float32)  # (2*7-1)^2
        out = resize_bias_table(t, 7, 12)
        assert out.shape == (23 * 23, 4)


class TestBNFolding:
    def test_stem_outputs_unchanged(self, rng):
        import jax
        from panoswintransformerobjectdetection_tpu.models.layers import (
            ConvStemPatchEmbed)
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            fold_batchnorm)
        m = ConvStemPatchEmbed(patch_size=4, embed_dim=12)
        x = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        # give BN non-trivial running stats
        bs = jax.tree_util.tree_map(lambda a: a + 0.3, v["batch_stats"])
        bs = jax.tree_util.tree_map(np.abs, bs)
        ref = m.apply({"params": v["params"], "batch_stats": bs}, x)
        fp, fbs = fold_batchnorm(v["params"], bs)
        out = m.apply({"params": fp, "batch_stats": fbs}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


class TestDetectorConverterTree:
    def test_converted_tree_matches_init(self, rng):
        """convert_detector output must slot into our detector's params
        (same keys, same shapes) — guards against naming drift."""
        import jax
        import torch
        import torch.nn as nn
        from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            convert_detector)

        if REF is None:
            pytest.skip("reference unavailable")

        depths = (2, 2)
        torch.manual_seed(0)
        bb = REF.SimplePanoSwinTransformer(
            patch_size=4, in_chans=3, embed_dim=6, depths=list(depths),
            num_heads=[1, 2], window_size=4, ape=True, pano_mode=True,
            out_indices=(0, 1), drop_path_rate=0.0)

        # synthesize the head parts of a torch Faster R-CNN state_dict
        sd = {f"backbone.{k}": v for k, v in bb.state_dict().items()}

        class L(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(6, 16, 1)

        for i, c in enumerate((6, 12)):
            lat = nn.Conv2d(c, 16, 1)
            fpn = nn.Conv2d(16, 16, 3)
            sd.update({f"neck.lateral_convs.{i}.conv.{k}": v
                       for k, v in lat.state_dict().items()})
            sd.update({f"neck.fpn_convs.{i}.conv.{k}": v
                       for k, v in fpn.state_dict().items()})
        sd.update({f"rpn_head.rpn_conv.{k}": v
                   for k, v in nn.Conv2d(16, 16, 3).state_dict().items()})
        sd.update({f"rpn_head.rpn_cls.{k}": v
                   for k, v in nn.Conv2d(16, 3, 1).state_dict().items()})
        sd.update({f"rpn_head.rpn_reg.{k}": v
                   for k, v in nn.Conv2d(16, 12, 1).state_dict().items()})
        sd.update({f"roi_head.bbox_head.shared_fcs.0.{k}": v
                   for k, v in nn.Linear(16 * 49, 32).state_dict().items()})
        sd.update({f"roi_head.bbox_head.shared_fcs.1.{k}": v
                   for k, v in nn.Linear(32, 32).state_dict().items()})
        sd.update({f"roi_head.bbox_head.fc_cls.{k}": v
                   for k, v in nn.Linear(32, 3).state_dict().items()})
        sd.update({f"roi_head.bbox_head.fc_reg.{k}": v
                   for k, v in nn.Linear(32, 8).state_dict().items()})

        params, stats = convert_detector(sd, depths=depths, window_size=4)

        det = build(DETECTORS, {
            "type": "PanoFasterRCNN",
            "backbone": {"type": "PanoSwinTransformer", "embed_dim": 6,
                         "depths": depths, "num_heads": (1, 2),
                         "window_size": 4, "ape": True, "out_indices": (0, 1),
                         "drop_path_rate": 0.0},
            "neck": {"type": "FPN", "in_channels": (6, 12), "out_channels": 16,
                     "num_outs": 5},
            "num_classes": 2, "featmap_strides": (4, 8, 8, 8),
        })
        ref_tree = det.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 64, 3), jnp.float32))

        import jax.tree_util as jtu
        ref_shapes = {jtu.keystr(k): v.shape for k, v in
                      jtu.tree_flatten_with_path(ref_tree["params"])[0]}
        got_shapes = {jtu.keystr(k): np.asarray(v).shape for k, v in
                      jtu.tree_flatten_with_path(params)[0]}
        # every converted entry must exist in the init tree with same shape
        # (bbox_head fc dims differ because the synthetic sd used small dims;
        # check key coverage + backbone/neck/rpn shapes strictly)
        missing = [k for k in got_shapes if k not in ref_shapes]
        assert not missing, missing[:5]
        for k, shp in got_shapes.items():
            # head channel dims in the synthetic sd are intentionally small;
            # strict shape equality is checked for backbone + neck
            if "bbox_head" in k or "rpn_m" in k:
                continue
            assert ref_shapes[k] == shp, (k, ref_shapes[k], shp)
