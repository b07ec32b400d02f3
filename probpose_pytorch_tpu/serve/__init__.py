"""Serving deployment: exported StableHLO bundles (`serve.export`).

The reference has no deployment story (its inference is "unpickle the
torch module", reference inference.py:62-70); this is the TPU-native one:
`jax.export` serializes the full fused serving program (crop -> backbone ->
head -> decode -> un-map) per batch bucket, so production hosts run the
exact compiled pipeline without the model-building Python (flax defs,
configs, codec) on the box.
"""

from probpose_pytorch_tpu.serve.export import (
    BottomUpBundle,
    DetectorBundle,
    FusedBundle,
    ServingBundle,
    export_bottomup_bundle,
    export_detector_bundle,
    export_fused_bundle,
    export_predictor_bundle,
)
from probpose_pytorch_tpu.serve.server import MicroBatcher, PoseHTTPServer

__all__ = [
    "BottomUpBundle",
    "DetectorBundle",
    "FusedBundle",
    "ServingBundle",
    "export_bottomup_bundle",
    "export_detector_bundle",
    "export_fused_bundle",
    "export_predictor_bundle",
    "MicroBatcher",
    "PoseHTTPServer",
]
