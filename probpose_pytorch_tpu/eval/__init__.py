from probpose_pytorch_tpu.eval.coco_eval import (  # noqa: F401
    COCOKeypointEvaluator,
    oks_matrix,
)
from probpose_pytorch_tpu.eval.calibration import (  # noqa: F401
    calibration_report,
    expected_calibration_error,
    fit_temperature,
)
from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown  # noqa: F401
