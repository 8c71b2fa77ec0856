# Reference configs/_base_/models/faster_rcnn_swin_fpn.py — Swin-T
# backbone under the Faster R-CNN graph (the planar sibling of
# faster_rcnn_panoswin_fpn.py).
model = dict(
    type="FasterRCNN",
    backbone=dict(type="SwinTransformer", embed_dim=96, depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24), window_size=7, ape=False,
                  drop_path_rate=0.2, patch_norm=True,
                  out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(96, 192, 384, 768), out_channels=256,
              num_outs=5),
    num_classes=80,
)
