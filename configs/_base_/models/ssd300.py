# Reference configs/_base_/models/ssd300.py — VGG-16 SSD, 300x300 input.
model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG"),
    num_classes=80,
    input_size=300,
)
