"""Detection result rendering (`mmdet/core/visualization/image.py
imshow_det_bboxes` analogue, cv2-based)."""

from typing import Optional, Sequence

import numpy as np


def imshow_det_bboxes(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                      scores: Optional[np.ndarray] = None,
                      class_names: Optional[Sequence[str]] = None,
                      score_thr: float = 0.3,
                      color=(0, 255, 0), thickness: int = 2,
                      out_file: Optional[str] = None) -> np.ndarray:
    import cv2
    img = img.copy()
    for i in range(len(boxes)):
        if scores is not None and scores[i] < score_thr:
            continue
        x1, y1, x2, y2 = [int(v) for v in boxes[i][:4]]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = (class_names[labels[i]] if class_names is not None
                else str(int(labels[i])))
        text = f"{name}" + (f" {scores[i]:.2f}" if scores is not None else "")
        cv2.putText(img, text, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img
