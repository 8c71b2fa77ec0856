# Reference configs/_base_/models/mask_rcnn_r50_caffe_c4.py.
_base_ = ["faster_rcnn_r50_caffe_c4.py"]
model = dict(type="MaskRCNN", with_mask=True)
