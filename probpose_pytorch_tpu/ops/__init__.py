"""Batched, jittable numeric ops (the reference's L1/L2 layer, TPU-native)."""

from probpose_pytorch_tpu.ops.heatmap import (  # noqa: F401
    build_oks_conv_operators,
    calc_distances,
    distance_acc,
    expected_value_decode,
    heatmap_maximum,
    oks_conv,
    subpixel_refine,
)
from probpose_pytorch_tpu.ops.oks import (  # noqa: F401
    oks_targets_from_coords,
    per_keypoint_oks,
)
from probpose_pytorch_tpu.ops.probmaps import generate_probmaps, oks_spread  # noqa: F401
from probpose_pytorch_tpu.ops.sparsemax import sparsemax  # noqa: F401
from probpose_pytorch_tpu.ops.udp import (  # noqa: F401
    build_gaussian_blur_operators,
    gaussian_blur_modulate,
    refine_keypoints_dark_udp,
)
from probpose_pytorch_tpu.ops.quant import (  # noqa: F401
    dynamic_quantize_rows,
    int8_matmul,
    quantize_weight,
)
