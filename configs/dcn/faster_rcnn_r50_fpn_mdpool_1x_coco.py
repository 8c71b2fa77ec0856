# faster_rcnn_r50_fpn_mdpool_1x_coco (reference configs/dcn/):
# modulated deformable RoI pooling on the bbox extractor.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(roi_extractor="mdpool")
