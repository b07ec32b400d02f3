from probpose_pytorch_tpu.ops.pallas.sparsemax_kernel import (  # noqa: F401
    sparsemax_pallas,
)
