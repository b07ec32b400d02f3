from probpose_pytorch_tpu.utils.logging import MetricsLogger  # noqa: F401
