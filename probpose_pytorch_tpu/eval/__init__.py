from probpose_pytorch_tpu.eval.coco_eval import (  # noqa: F401
    COCOKeypointEvaluator,
    oks_matrix,
)
from probpose_pytorch_tpu.eval.pipeline import evaluate_topdown  # noqa: F401
