# PanoSwin-T Mask R-CNN on COCO (planar imagery; pano ops degrade to
# stock swin when pano_ratio_v covers the full sphere).
_base_ = ["../_base_/models/faster_rcnn_panoswin_fpn.py",
          "../_base_/datasets/coco_instance.py",
          "../_base_/schedules/schedule_1x.py",
          "../_base_/default_runtime.py"]
model = dict(type="MaskRCNN", with_mask=True, num_classes=80,
             backbone=dict(pano_mode=False))
