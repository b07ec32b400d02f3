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
from probpose_pytorch_tpu.eval.results import (  # noqa: F401
    load_results,
    save_results,
    score_results,
)
