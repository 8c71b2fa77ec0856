# faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person-bicycle-car (reference configs/faster_rcnn/).
_base_ = ["faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"]
model = dict(num_classes=3)
data = dict(train=dict(classes=("person", "bicycle", "car")),
            val=dict(classes=("person", "bicycle", "car")),
            test=dict(classes=("person", "bicycle", "car")))
