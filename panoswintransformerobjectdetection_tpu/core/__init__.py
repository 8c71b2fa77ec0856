"""Detection algorithm core: boxes, anchors, assignment, sampling, losses.

TPU-native redesign of `mmdet/core/`: everything is fixed-shape (padded
boxes with validity masks), batched via vmap, and jit-safe — no dynamic
boolean indexing anywhere.
"""

from .bbox import (
    bbox_overlaps, bbox_area, delta_encode, delta_decode, clip_boxes, flip_boxes,
    bbox_flip, bbox_mapping, bbox_mapping_back, bbox2roi, roi2bbox,
    bbox2result, distance2bbox, bbox2distance, bbox_rescale,
    bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh, multi_apply,
)
from .anchors import (AnchorGenerator, PointGenerator, YOLOAnchorGenerator,
                      ANCHOR_GENERATORS, build_anchor_generator,
                      images_to_levels, anchor_inside_flags, calc_region)
from .assigner import max_iou_assign
from .sampler import random_sample
from .merge_augs import (merge_aug_proposals, merge_aug_bboxes,
                         merge_aug_scores, merge_aug_masks)
from .mask_structures import (BaseInstanceMasks, BitmapMasks, PolygonMasks,
                              encode_mask_results, split_combined_polys)
from .class_names import (voc_classes, coco_classes, cityscapes_classes,
                          imagenet_det_classes, imagenet_vid_classes,
                          wider_face_classes, dataset_aliases, get_classes)
from .evaluation import (average_precision, eval_map, eval_recalls,
                         print_map_summary, print_recall_summary,
                         plot_num_recall, plot_iou_recall)
from .coder import (BaseBBoxCoder, DeltaXYWHBBoxCoder, PseudoBBoxCoder,
                    TBLRBBoxCoder, DistancePointBBoxCoder, BBOX_CODERS,
                    build_bbox_coder)
from . import losses

__all__ = [
    "bbox_overlaps", "bbox_area", "delta_encode", "delta_decode", "clip_boxes",
    "flip_boxes", "AnchorGenerator", "max_iou_assign", "random_sample", "losses",
    "bbox_flip", "bbox_mapping", "bbox_mapping_back", "bbox2roi", "roi2bbox",
    "bbox2result", "distance2bbox", "bbox2distance", "bbox_rescale",
    "bbox_cxcywh_to_xyxy", "bbox_xyxy_to_cxcywh", "multi_apply",
    "merge_aug_proposals", "merge_aug_bboxes", "merge_aug_scores",
    "merge_aug_masks",
    "PointGenerator", "YOLOAnchorGenerator", "ANCHOR_GENERATORS",
    "build_anchor_generator", "images_to_levels", "anchor_inside_flags",
    "calc_region",
    "BaseInstanceMasks", "BitmapMasks", "PolygonMasks",
    "encode_mask_results", "split_combined_polys",
    "voc_classes", "coco_classes", "cityscapes_classes",
    "imagenet_det_classes", "imagenet_vid_classes", "wider_face_classes",
    "dataset_aliases", "get_classes",
    "average_precision", "eval_map", "eval_recalls", "print_map_summary",
    "print_recall_summary", "plot_num_recall", "plot_iou_recall",
    "BaseBBoxCoder", "DeltaXYWHBBoxCoder", "PseudoBBoxCoder",
    "TBLRBBoxCoder", "DistancePointBBoxCoder", "BBOX_CODERS",
    "build_bbox_coder",
]
