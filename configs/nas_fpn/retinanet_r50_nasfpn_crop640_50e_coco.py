# RetinaNet + NAS-FPN (reference configs/nas_fpn/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(
    neck=dict(_delete_=True, type="NASFPN",
              in_channels=(512, 1024, 2048), out_channels=256,
              num_outs=5, stack_times=7),
    # reference: bbox_head=RetinaSepBNHead (shared convs, per-level BN)
    head=dict(type="RetinaSepBNHead", use_sepbn=True),
)
