"""PanoSwin v1 (prior-revision backbone) golden parity vs the reference
`panoswin_transformer_v1.py` (unregistered upstream, rebuilt for
inventory completeness)."""

import numpy as np
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.models.panoswin_v1 import (
    PanoSwinTransformerV1)
from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
    convert_panoswin_v1_backbone)
from reference_loader import load_reference_panoswin_v1

REF = load_reference_panoswin_v1()


def _build_pair(win_trans_type, ape=False, depths=(2, 2)):
    import torch
    torch.manual_seed(0)
    ref = REF.PanoSwinTransformer(
        patch_size=4, in_chans=3, embed_dim=6, depths=list(depths),
        num_heads=[1, 2], window_size=4, ape=ape, drop_path_rate=0.0,
        out_indices=tuple(range(len(depths))), win_trans_type=win_trans_type,
        basketball_trans=False, emb_conv_type="cnn")
    ref.eval()
    params, stats = convert_panoswin_v1_backbone(ref.state_dict(), depths,
                                                 window_size=4)
    ours = PanoSwinTransformerV1(
        patch_size=4, embed_dim=6, depths=depths, num_heads=(1, 2),
        window_size=4, ape=ape, drop_path_rate=0.0,
        out_indices=tuple(range(len(depths))), win_trans_type=win_trans_type)
    return ref, ours, {"params": params, "batch_stats": stats}


@pytest.mark.skipif(REF is None, reason="reference v1 revision unavailable")
class TestPanoSwinV1Parity:
    @pytest.mark.parametrize("wtt,ape", [(1, False), (0, False), (1, True)])
    def test_feature_parity(self, rng, wtt, ape):
        import torch
        ref, ours, variables = _build_pair(wtt, ape)
        H, W = 32, 64
        x = rng.random((2, 3, H, W)).astype(np.float32)
        prv = [[0.0, 1.0, H], [0.0, 1.0, H]]
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x), pano_ratio_v=[list(p) for p in prv])
        our_outs = ours.apply(
            variables, jnp.asarray(np.moveaxis(x, 1, -1)),
            pano_ratio_v=jnp.asarray(prv, jnp.float32))
        assert len(ref_outs) == len(our_outs)
        for r, o in zip(ref_outs, our_outs):
            r = r.numpy()
            o = np.moveaxis(np.asarray(o), -1, 1)
            assert r.shape == o.shape, (r.shape, o.shape)
            err = np.abs(r - o).max()
            assert err < 3e-4, f"v1 parity err {err} (wtt={wtt}, ape={ape})"

    def test_partial_pano_ratio(self, rng):
        """Different v-range per image still matches the reference."""
        import torch
        ref, ours, variables = _build_pair(1)
        H, W = 32, 64
        x = rng.random((2, 3, H, W)).astype(np.float32)
        prv = [[0.0, 0.8, H], [0.1, 1.0, H]]
        with torch.no_grad():
            ref_outs = ref(torch.tensor(x), pano_ratio_v=[list(p) for p in prv])
        our_outs = ours.apply(
            variables, jnp.asarray(np.moveaxis(x, 1, -1)),
            pano_ratio_v=jnp.asarray(prv, jnp.float32))
        for r, o in zip(ref_outs, our_outs):
            err = np.abs(r.numpy() - np.moveaxis(np.asarray(o), -1, 1)).max()
            assert err < 3e-4, f"partial-pano parity err {err}"
