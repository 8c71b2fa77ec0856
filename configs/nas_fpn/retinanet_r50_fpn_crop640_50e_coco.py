# retinanet_r50_fpn_crop640_50e_coco (reference configs/nas_fpn/).
_base_ = ["retinanet_r50_nasfpn_crop640_50e_coco.py"]
model = dict(neck=dict(_delete_=True, type="FPN",
                       in_channels=(512, 1024, 2048), out_channels=256,
                       num_outs=5, add_extra_convs=True))
