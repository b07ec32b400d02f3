"""Data loaders and host pipeline.

Visibility conventions (pinned by tests/test_data_conventions.py — do NOT
"unify" these; they intentionally differ per format):

| field                  | YOLO loader (yolo.py)      | COCO loader (coco.py) |
|------------------------|----------------------------|-----------------------|
| raw flag `v`           | promoted: v==1 -> 2        | kept as annotated     |
| `keypoints_visible`    | v == 2 (== labeled, post-  | v >= 1 (labeled)      |
|                        | promotion)                 |                       |
| `keypoints_visibility` | min(v, 1) (== labeled)     | v == 2 (unoccluded)   |

Semantics downstream: `keypoints_visible` gates heatmap supervision
("annotated"); `keypoints_visibility` is the visibility-branch target.
The reference's YOLO dataset (dataset.py:45-47, 124-126) destroys occlusion
information by promoting v==1 to 2 — we keep that quirk for parity, so for
YOLO data every labeled keypoint trains visibility=1. COCO annotations retain
occlusion, so there the visibility branch learns occluded-vs-unoccluded, which
is the ProbPose paper's intent. Both loaders agree that unlabeled (v==0)
keypoints supervise nothing.
"""

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
from probpose_pytorch_tpu.data.synth_coco import (  # noqa: F401
    generate_coco_synth,
)
from probpose_pytorch_tpu.data.mixed import (  # noqa: F401
    MixedPoseDataset,
    build_mixed_datasets,
)
