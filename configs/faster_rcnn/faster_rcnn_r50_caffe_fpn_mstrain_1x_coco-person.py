# faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person (reference configs/faster_rcnn/).
_base_ = ["faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"]
model = dict(num_classes=1)
data = dict(train=dict(classes=("person",)), val=dict(classes=("person",)),
            test=dict(classes=("person",)))
