"""Full-size converted-checkpoint parity (VERDICT r1 item 3).

The toy-scale golden tests (embed_dim=6, ws=4) miss size-dependent paths:
ws=7 padding, 169-entry bias tables, the ew2ns odd-size dance at real
resolutions, bicubic ape upsampling at scale.  Here the REAL PanoSwin-T /
Swin-T geometry (embed_dim 96, depths (2,2,6,2), heads (3,6,12,24),
window 7) runs under converted random-init torch weights at an
equirect-shaped input, and every output stage must match at f32.

Reference modules: `simple_panoswin_transformer.py:780`,
`swin_transformer.py:449` (torch CPU, heavy deps stubbed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-size/overfit tier (VERDICT r3 #8)

from panoswintransformerobjectdetection_tpu.models.panoswin import (
    PanoSwinTransformer)
from panoswintransformerobjectdetection_tpu.models.swin import SwinTransformer
from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
    convert_panoswin_backbone, convert_swin_backbone)
from reference_loader import load_reference_panoswin, load_reference_swin

REF_PANO = load_reference_panoswin()
REF_SWIN = load_reference_swin()

TINY_T = dict(patch_size=4, embed_dim=96, depths=(2, 2, 6, 2),
              num_heads=(3, 6, 12, 24), window_size=7,
              out_indices=(0, 1, 2, 3), drop_path_rate=0.0)
# 256x512 equirect: big enough for every stage to have multiple ws=7
# windows with non-divisible padding (64x128 -> 8x16 at stage 3), small
# enough for torch-CPU in CI.
H, W = 256, 512


@pytest.mark.skipif(REF_SWIN is None, reason="reference swin unavailable")
class TestSwinTinyFullSize:
    @pytest.mark.parametrize("ape", [False, True])
    def test_stage_parity(self, rng, ape):
        import torch
        torch.manual_seed(0)
        ref = REF_SWIN.SwinTransformer(
            pretrain_img_size=224, patch_size=4, in_chans=3, embed_dim=96,
            depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24], window_size=7,
            ape=ape, drop_path_rate=0.0, out_indices=(0, 1, 2, 3))
        ref.eval()
        params, _ = convert_swin_backbone(ref.state_dict(), (2, 2, 6, 2),
                                          window_size=7)
        ours = SwinTransformer(ape=ape, pretrain_img_size=224, **TINY_T)
        x = rng.random((1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x))
        our_outs = ours.apply({"params": params},
                              jnp.asarray(np.moveaxis(x, 1, -1)))
        assert len(ref_outs) == 4
        for s, (r, o) in enumerate(zip(ref_outs, our_outs)):
            r = r.numpy()
            o = np.moveaxis(np.asarray(o), -1, 1)
            assert r.shape == o.shape
            err = np.abs(r - o).max()
            assert err < 1e-3, f"stage {s} err {err} (ape={ape})"


@pytest.mark.skipif(REF_PANO is None, reason="reference panoswin unavailable")
class TestPanoSwinTinyFullSize:
    @pytest.mark.parametrize("pano", [True, False])
    def test_stage_parity(self, rng, pano):
        import torch
        torch.manual_seed(0)
        ref = REF_PANO.SimplePanoSwinTransformer(
            patch_size=4, in_chans=3, embed_dim=96, depths=[2, 2, 6, 2],
            num_heads=[3, 6, 12, 24], window_size=7, ape=True,
            pano_mode=pano, out_indices=(0, 1, 2, 3), drop_path_rate=0.0)
        ref.eval()
        params, stats = convert_panoswin_backbone(
            ref.state_dict(), (2, 2, 6, 2), window_size=7)
        ours = PanoSwinTransformer(pano_mode=pano, in_chans=3, ape=True,
                                   **TINY_T)
        x = rng.random((1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x))
        our_outs = ours.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(np.moveaxis(x, 1, -1)))
        for s, (r, o) in enumerate(zip(ref_outs, our_outs)):
            r = r.numpy()
            o = np.moveaxis(np.asarray(o), -1, 1)
            assert r.shape == o.shape
            err = np.abs(r - o).max()
            assert err < 1e-3, f"stage {s} err {err} (pano={pano})"
