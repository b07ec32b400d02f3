from probpose_pytorch_tpu.ops.pallas.sparsemax_kernel import (  # noqa: F401
    sparsemax_pallas,
)
from probpose_pytorch_tpu.ops.pallas.decode_kernel import (  # noqa: F401
    expected_value_decode_pallas,
)
from probpose_pytorch_tpu.ops.pallas.attention_kernel import (  # noqa: F401
    fused_attention,
    packed_attention,
    sharded_packed_attention,
)
from probpose_pytorch_tpu.ops.pallas.attention_tiled import (  # noqa: F401
    tiled_attention,
)
from probpose_pytorch_tpu.ops.pallas.mlp_kernel import (  # noqa: F401
    fused_ln_mlp,
)
