from probpose_pytorch_tpu.compat.torch_import import (  # noqa: F401
    import_head_params,
    import_timm_vit_params,
    state_dict_from_checkpoint,
)
from probpose_pytorch_tpu.compat.layouts import (  # noqa: F401
    convert_qkv_layout,
    convert_trunk_layout,
    qkv_head_major_permutation,
    qkv_to_head_major,
    qkv_to_qkv_major,
    stack_vit_blocks,
    unstack_vit_blocks,
)
