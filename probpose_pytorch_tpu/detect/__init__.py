"""Person detection subpackage: the standalone front end of the top-down
pipeline (frame -> boxes -> pose), plus the SINGLE-STAGE pose family
(CenterNet objects-as-points: --keypoints K adds a joint-offset head so one
forward on the frame yields every person's pose). Greenfield superset — the
reference has no detector and is top-down only (SURVEY.md §2.4)."""

from probpose_pytorch_tpu.detect.codec import (
    decode_boxes,
    decode_poses,
    encode_boxes,
    gaussian_radius,
)
from probpose_pytorch_tpu.detect.data import FrameDetectionDataset
from probpose_pytorch_tpu.detect.fused import (
    FusedTwoStagePredictor,
    expand_boxes_jax,
)
from probpose_pytorch_tpu.detect.loss import detection_loss
from probpose_pytorch_tpu.detect.model import PersonDetector
from probpose_pytorch_tpu.detect.pipeline import (
    BottomUpPredictor,
    DetectorPredictor,
    box_iou_matrix,
    detection_pr,
    evaluate_bottomup,
    evaluate_detector_topdown,
)
from probpose_pytorch_tpu.detect.train import (
    DetectorTrainer,
    load_bottomup,
    load_detector,
)

__all__ = [
    "BottomUpPredictor",
    "DetectorPredictor",
    "DetectorTrainer",
    "FrameDetectionDataset",
    "FusedTwoStagePredictor",
    "PersonDetector",
    "box_iou_matrix",
    "decode_boxes",
    "decode_poses",
    "detection_loss",
    "detection_pr",
    "encode_boxes",
    "evaluate_bottomup",
    "evaluate_detector_topdown",
    "expand_boxes_jax",
    "gaussian_radius",
    "load_bottomup",
    "load_detector",
]
