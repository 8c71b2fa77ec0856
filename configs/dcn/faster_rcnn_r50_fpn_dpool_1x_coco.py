# faster_rcnn_r50_fpn_dpool_1x_coco (reference configs/dcn/):
# deformable RoI pooling on the bbox extractor.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(roi_extractor="dpool")
