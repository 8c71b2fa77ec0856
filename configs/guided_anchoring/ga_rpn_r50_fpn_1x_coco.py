# ga_rpn_r50_fpn_1x_coco (reference configs/guided_anchoring/):
# proposal-only guided-anchor RPN (evaluated by proposal AR).
_base_ = ["../rpn/rpn_r50_fpn_1x_coco.py"]
model = dict(
    _delete_=True,
    type="GARPN",
    backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
              out_channels=256, num_outs=5),
)
