# Libra R-CNN (reference configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py):
# FPN + Balanced Feature Pyramid (non-local refine), BalancedL1 rcnn
# regression, IoU-balanced negative / instance-balanced positive sampling,
# rpn negatives capped at 5x positives.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    neck=[dict(type="FPN", in_channels=(256, 512, 1024, 2048),
               out_channels=256, num_outs=5),
          dict(type="BFP", in_channels=256, num_levels=5,
               refine_level=2, refine_type="non_local")],
    train_cfg=dict(
        rpn=dict(neg_pos_ub=5),
        rcnn=dict(
            sampler=dict(pos_sampler="instance_balanced",
                         neg_sampler="iou_balanced",
                         floor_thr=-1, floor_fraction=0, num_bins=3),
            reg_loss="balanced_l1")))
