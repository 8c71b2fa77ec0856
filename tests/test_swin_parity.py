"""Stock Swin golden parity: reference swin_transformer.py (torch) vs our
flax SwinTransformer under converted weights — the COCO-checkpoint path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-size/overfit tier (VERDICT r3 #8)

from panoswintransformerobjectdetection_tpu.models.swin import SwinTransformer
from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
    convert_swin_backbone)
from reference_loader import load_reference_swin

REF = load_reference_swin()


@pytest.mark.skipif(REF is None, reason="reference swin unavailable")
class TestSwinParity:
    @pytest.mark.parametrize("ape", [False, True])
    def test_feature_parity(self, rng, ape):
        import torch
        torch.manual_seed(0)
        depths = (2, 2)
        ref = REF.SwinTransformer(
            pretrain_img_size=32, patch_size=4, in_chans=3, embed_dim=6,
            depths=list(depths), num_heads=[1, 2], window_size=4,
            ape=ape, drop_path_rate=0.0, out_indices=(0, 1))
        ref.eval()
        params, _ = convert_swin_backbone(ref.state_dict(), depths, window_size=4)
        ours = SwinTransformer(patch_size=4, embed_dim=6, depths=depths,
                               num_heads=(1, 2), window_size=4, ape=ape,
                               pretrain_img_size=32, drop_path_rate=0.0,
                               out_indices=(0, 1))
        x = rng.random((1, 3, 32, 64)).astype(np.float32)
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x))
        our_outs = ours.apply({"params": params},
                              jnp.asarray(np.moveaxis(x, 1, -1)))
        assert len(ref_outs) == len(our_outs)
        for r, o in zip(ref_outs, our_outs):
            r = r.numpy()
            o = np.moveaxis(np.asarray(o), -1, 1)
            assert r.shape == o.shape
            err = np.abs(r - o).max()
            assert err < 2e-4, f"swin parity err {err} (ape={ape})"

    def test_odd_input_sizes(self, rng):
        import torch
        torch.manual_seed(0)
        ref = REF.SwinTransformer(patch_size=4, in_chans=3, embed_dim=6, depths=[2],
                                  num_heads=[2], window_size=4, ape=False,
                                  drop_path_rate=0.0, out_indices=(0,))
        ref.eval()
        params, _ = convert_swin_backbone(ref.state_dict(), (2,), window_size=4)
        ours = SwinTransformer(patch_size=4, embed_dim=6, depths=(2,),
                               num_heads=(2,), window_size=4,
                               drop_path_rate=0.0, out_indices=(0,))
        x = rng.random((1, 3, 45, 67)).astype(np.float32)
        with torch.no_grad():
            r = ref(torch.tensor(x))[0].numpy()
        o = np.moveaxis(np.asarray(
            ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))[0]),
            -1, 1)
        assert np.abs(r - o).max() < 2e-4
