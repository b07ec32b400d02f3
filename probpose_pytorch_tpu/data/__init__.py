from probpose_pytorch_tpu.data.pipeline import (  # noqa: F401
    Prefetcher,
    SyntheticPoseDataset,
    batch_iterator,
)
from probpose_pytorch_tpu.data.yolo import (  # noqa: F401
    YOLOPoseDataset,
    parse_yolo_annotations,
)
from probpose_pytorch_tpu.data.cache import (  # noqa: F401
    CachedCropDataset,
    build_crop_cache,
)
from probpose_pytorch_tpu.data.coco import (  # noqa: F401
    COCOPoseDataset,
    parse_coco_annotations,
)
