from probpose_pytorch_tpu.data.pipeline import (  # noqa: F401
    Prefetcher,
    SyntheticPoseDataset,
    batch_iterator,
)
from probpose_pytorch_tpu.data.yolo import (  # noqa: F401
    YOLOPoseDataset,
    parse_yolo_annotations,
)
