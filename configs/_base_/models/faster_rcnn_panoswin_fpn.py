# PanoSwin-T Faster R-CNN base model graph.
# Mirrors the hyperparameters of the reference's
# configs/_base_/models/faster_rcnn_panoswin_fpn.py in this framework's
# schema (anchor/assigner/sampler/NMS values are identical).
model = dict(
    type="PanoFasterRCNN",
    backbone=dict(
        type="PanoSwinTransformer",
        embed_dim=96,
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        window_size=7,
        mlp_ratio=4.0,
        qkv_bias=True,
        drop_path_rate=0.2,
        ape=False,
        patch_norm=True,
        out_indices=(0, 1, 2, 3),
        pano_mode=True,
    ),
    neck=dict(
        type="FPN",
        in_channels=(96, 192, 384, 768),
        out_channels=256,
        num_outs=5,
    ),
    num_classes=80,
    anchor_scales=(8.0,),
    anchor_ratios=(0.5, 1.0, 2.0),
    anchor_strides=(4, 8, 16, 32, 64),
    rpn_target_stds=(1.0, 1.0, 1.0, 1.0),
    rcnn_target_stds=(0.1, 0.1, 0.2, 0.2),
    train_cfg=dict(
        rpn=dict(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                 num_samples=256, pos_fraction=0.5),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000, iou_threshold=0.7,
                          min_bbox_size=0),
        rcnn=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                  num_samples=512, pos_fraction=0.25),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000, iou_threshold=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, iou_threshold=0.5, max_per_img=100),
    ),
)
