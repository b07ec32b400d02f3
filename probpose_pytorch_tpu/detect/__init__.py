"""Person detection subpackage: the standalone front end of the top-down
pipeline (frame -> boxes -> pose). Greenfield superset — the reference has
no detector (SURVEY.md §2.4)."""

from probpose_pytorch_tpu.detect.codec import (
    decode_boxes,
    encode_boxes,
    gaussian_radius,
)
from probpose_pytorch_tpu.detect.data import FrameDetectionDataset
from probpose_pytorch_tpu.detect.loss import detection_loss
from probpose_pytorch_tpu.detect.model import PersonDetector
from probpose_pytorch_tpu.detect.pipeline import (
    DetectorPredictor,
    box_iou_matrix,
    detection_pr,
    evaluate_detector_topdown,
)
from probpose_pytorch_tpu.detect.train import DetectorTrainer, load_detector

__all__ = [
    "DetectorPredictor",
    "DetectorTrainer",
    "FrameDetectionDataset",
    "PersonDetector",
    "box_iou_matrix",
    "decode_boxes",
    "detection_loss",
    "detection_pr",
    "encode_boxes",
    "evaluate_detector_topdown",
    "gaussian_radius",
    "load_detector",
]
