from probpose_pytorch_tpu.compat.torch_import import (  # noqa: F401
    import_head_params,
    import_timm_vit_params,
    state_dict_from_checkpoint,
)
