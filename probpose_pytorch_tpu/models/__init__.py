from probpose_pytorch_tpu.models.head import ProbMapHead  # noqa: F401
from probpose_pytorch_tpu.models.model import (  # noqa: F401
    ModelConfig,
    ProbPoseModel,
    build_model,
)
from probpose_pytorch_tpu.models.lora import (  # noqa: F401
    LoRADelta,
    lora_frozen_labels,
    merge_lora_params,
)
from probpose_pytorch_tpu.models.vit import ViTBackbone, ViTConfig  # noqa: F401
