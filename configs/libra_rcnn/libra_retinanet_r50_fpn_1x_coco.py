# libra_retinanet_r50_fpn_1x_coco (reference configs/libra_rcnn/):
# RetinaNet with the BFP balanced-feature neck (non-local refine) chained
# after FPN and BalancedL1 regression (beta=0.11).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    neck=[
        dict(type="FPN", in_channels=(512, 1024, 2048), out_channels=256,
             num_outs=5, start_level=1, add_extra_convs=True),
        dict(type="BFP", in_channels=256, num_levels=5, refine_level=1,
             refine_type="non_local"),
    ],
    loss_bbox=dict(type="BalancedL1", alpha=0.5, gamma=1.5, beta=0.11,
                   loss_weight=1.0))
