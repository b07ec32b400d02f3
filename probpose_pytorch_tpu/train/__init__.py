from probpose_pytorch_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from probpose_pytorch_tpu.train.config import (  # noqa: F401
    LossWeights,
    OptimConfig,
    TrainConfig,
)
from probpose_pytorch_tpu.train.loop import (  # noqa: F401
    Trainer,
    build_codecs,
    layout_metadata,
    make_eval_step,
    make_train_step,
    qkv_layout_of,
    restore_state_with_layout,
)
from probpose_pytorch_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
)
