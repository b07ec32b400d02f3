from probpose_pytorch_tpu.parallel.distributed import (  # noqa: F401
    local_batch_size,
    maybe_initialize_distributed,
    process_info,
)
from probpose_pytorch_tpu.parallel.mesh import make_hybrid_mesh, make_mesh  # noqa: F401
from probpose_pytorch_tpu.parallel.pipeline import (  # noqa: F401
    pick_microbatches,
    pipeline_spmd,
)
from probpose_pytorch_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    head_batch_spec,
    opt_state_shardings,
    param_shardings,
    shard_batch,
    shard_opt_state,
    shard_params,
)
