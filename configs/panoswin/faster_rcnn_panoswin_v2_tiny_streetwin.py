# PanoFasterRCNN with the v-variant backbone (per-image pano_ratio_v,
# product-form sphere bias) — the reference's exact detection composition
# (configs/_base_/models/faster_rcnn_panoswin_fpn.py:5 instantiates
# `PanoSwinTransformer` = panoswin_transformer.py = our V2).
_base_ = ["faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="PanoSwinTransformerV2",
        embed_dim=96,
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        window_size=7,
        win_trans_type=1,
        ape=True,
        drop_path_rate=0.1,
        patch_norm=True,
        out_indices=(0, 1, 2, 3),
    ),
)
