"""ProbPose-TPU: a TPU-native (JAX/XLA/Pallas) probabilistic 2-D pose
estimation framework with the full capability surface of the PyTorch
reference (zir-vision/ProbPose_pytorch), redesigned for TPU hardware.

Public API mirrors the reference's `probpose.{model, codec, heatmap, loss}`
modules; see docs/PARITY.md for the mapping. Heavier subsystems (train, data,
eval, parallel, compat) are regular submodules:

    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.inference import TopDownPredictor, load_predictor
"""

__version__ = "0.1.0"

from probpose_pytorch_tpu import codec, losses, models, ops  # noqa: F401
from probpose_pytorch_tpu.codec import ArgMaxProbMap, Codec, ProbMap  # noqa: F401
from probpose_pytorch_tpu.losses import ProbPoseLoss  # noqa: F401
from probpose_pytorch_tpu.models import (  # noqa: F401
    ModelConfig,
    ProbMapHead,
    ProbPoseModel,
    ViTBackbone,
    build_model,
)
