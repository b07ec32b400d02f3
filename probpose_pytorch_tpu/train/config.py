"""Training configuration (greenfield: the reference hard-codes constants at
/root/reference/probpose/train.py:19-48; SURVEY.md §5.6 calls a real config
layer out as new design). JSON-serializable dataclasses."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.ops.augment import AugmentConfig

__all__ = [
    "OptimConfig",
    "LossWeights",
    "DistillConfig",
    "TrainConfig",
    "AugmentConfig",
]


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + one-cycle cosine schedule + global-norm clipping (the
    reference's recipe, train.py:72-84,113)."""

    peak_lr: float = 5e-4
    weight_decay: float = 0.1
    # Optimizer family: "adamw" (reference recipe) | "lion" (sign-momentum;
    # one moment buffer instead of two — typical recipe: ~3-10x smaller
    # peak_lr, ~3x larger weight_decay than AdamW) | "adafactor" (factored
    # second moment — rank-1 row/col statistics instead of a full moment
    # tensor; the memory choice for ViT-H-scale trunks).
    optimizer: str = "adamw"
    # LR schedule: "onecycle" (reference recipe) | "cosine" (linear warmup
    # + cosine decay) | "constant" (flat peak_lr — the usual LoRA choice)
    schedule: str = "onecycle"
    pct_start: float = 0.1
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    clip_grad_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    ema_decay: float | None = None  # optional EMA of params
    accum_steps: int = 1  # gradient accumulation
    # Skip parameter updates when grads are non-finite (training-failure
    # containment; SURVEY.md §5.3 notes the reference has none). Aborts after
    # this many consecutive bad steps; 0 disables the guard.
    max_nonfinite_skips: int = 0


@dataclass(frozen=True)
class LossWeights:
    """Per-term loss weights (reference LOSS_WEIGHTS, train.py:26-32)."""

    kpt: float = 1.0
    probability: float = 1.0
    visibility: float = 0.0
    oks: float = 1.0
    error: float = 1.0

    def as_dict(self) -> dict[str, float]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class DistillConfig:
    """Knowledge distillation from a frozen teacher checkpoint (superset —
    the reference has no distillation). The teacher (any architecture with
    the same crop size / keypoint count / heatmap geometry, e.g. ViT-L
    teaching ViT-S) runs frozen inside the train step; the student adds
    MSE terms pulling its heatmaps and scalar branches (probability /
    visibility / oks) toward the teacher's. GT losses stay active — set
    loss weights to taste for pure-teacher regimes."""

    teacher_checkpoint: str = ""  # Orbax checkpoint directory (required)
    teacher_config: str = ""  # TrainConfig JSON (default: beside ckpt)
    ema_teacher: bool = True  # use the teacher's EMA params when present
    weight: float = 1.0  # overall distill weight in the total loss
    heatmap_weight: float = 1.0  # MSE on heatmaps
    scalar_weight: float = 0.1  # MSE on the sigmoid scalar branches


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss_weights: LossWeights = field(default_factory=LossWeights)
    augment: AugmentConfig | None = None  # None = no augmentation (ref parity)
    distill: DistillConfig | None = None  # None = no distillation
    epochs: int = 200
    train_batch_size: int = 32
    val_batch_size: int = 32
    val_every: int = 50
    log_every: int = 10
    checkpoint_every_epochs: int = 10
    keep_checkpoints: int = 3
    # Async checkpoint writes: save() returns once the state is snapshotted
    # off-device and the disk write proceeds in a background thread
    # (train/checkpoint.py); restore/close wait for in-flight writes.
    async_checkpoint: bool = False
    # Preemption-safe shutdown: catch SIGTERM (the TPU-pod / spot-VM
    # eviction signal) during fit, finish the in-flight step, save a
    # checkpoint, and exit cleanly so `resume: true` continues on restart.
    # Installed only in the main thread; the previous handler is restored
    # when fit returns.
    handle_preemption: bool = True
    seed: int = 0
    sigma: float = 2.0  # fixed encode spread (ProbMap default)
    decode_sigma: float = -1.0  # loss decoder spread (ArgMaxProbMap default)
    kpt_sigma_value: float = 0.05  # per-keypoint sigma fill (train.py:46-47)
    freeze_error: bool = True
    freeze_oks: bool = False
    learn_heatmaps_from_zeros: bool = False
    data_root: str = "./data/field-synth-2"
    dataset_format: str = "yolo"  # "yolo" | "coco" | "synthetic" | "mixed"
    # Host crop resampler: "" = the loader's default (lanczos for YOLO,
    # bilinear for COCO); "native" routes JPEG decode+crop+resize through
    # the C++ data plane (device-preprocess sampling convention).
    resample: str = ""
    # dataset_format "mixed": weighted concatenation of several corpora —
    # entries {"root": ..., "format": "coco"|"yolo", "repeat": n}; train
    # mixes all members (each repeated n times per epoch), validation uses
    # the FIRST member's val split (data/mixed.py).
    mixed_datasets: tuple = ()
    preprocess_method: str = "bilinear_matmul"  # frame-mode crop kernel
    # Materialize decoded crops into a packed memmap cache once and stream
    # raw bytes thereafter (data/cache.py); "" disables.
    cache_dir: str = ""
    num_workers: int = 4
    # Failure containment (SURVEY.md §5.3: the reference has none). Two
    # layers: optax apply_if_finite skips individual bad updates
    # (OptimConfig.max_nonfinite_skips); this host-side monitor catches
    # persistent divergence — two consecutive non-finite losses at log
    # points restore the last checkpoint — without adding any device syncs
    # (it reads the metrics the log step already transfers).
    recover_on_nonfinite: bool = True
    max_recoveries: int = 3
    out_dir: str = "./runs/default"
    resume: bool = True
    model_parallel: int = 1
    # Pipeline stages for deep trunks (parallel/pipeline.py); 1 = off.
    pipeline_parallel: int = 1
    # Pipeline schedule when pipeline_parallel > 1:
    #   "gpipe" — forward pipeline in the model, autodiff backward; O(M)
    #             activation memory per stage (combine with model.remat).
    #   "1f1b"  — one-forward-one-backward engine (pipeline_1f1b): the head
    #             and loss run INSIDE the pipeline at the last stage, O(S)
    #             activation memory, so microbatches can grow to amortize
    #             the bubble. Head BatchNorm sees per-microbatch batch
    #             statistics (grad-accumulation semantics) instead of the
    #             full per-step batch.
    pipeline_schedule: str = "gpipe"
    # ZeRO-1-style optimizer-state sharding over the data axis
    # (parallel/sharding.py:opt_state_shardings); dp-only meshes.
    shard_opt_state: bool = False
    # Device batches kept ready ahead of the step: host->device uploads run
    # on a worker thread so batch i+1's transfer overlaps step i's compute
    # (uploads block the calling thread, so the loop alone cannot overlap
    # them). <=1 disables (synchronous upload per step).
    device_prefetch: int = 2
    # LoRA-only fine-tuning: train the LoRA deltas (model.lora_rank > 0)
    # and the head; every other parameter gets zero updates
    # (models/lora.py:lora_frozen_labels via optax.multi_transform).
    train_lora_only: bool = False
    # Best-checkpoint tracking: a validation metric name ("loss",
    # "acc/pck", ...); whenever a validation pass improves it, the state is
    # saved to <out_dir>/checkpoints_best (keep=1, metadata records the
    # value — tracking survives resume). "" disables.
    track_best_metric: str = ""
    # "min" | "max" | "auto" (min iff the metric name contains "loss")
    track_best_mode: str = "auto"

    # ----- (de)serialization -----
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        raw = json.loads(text)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "TrainConfig":
        def build(dc_cls, data):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in data.items():
                if k.startswith("_"):
                    # JSON has no comments; underscore-prefixed keys are the
                    # conventional escape hatch ("_comment": "...") and are
                    # ignored (configs/radio_frozen_vitb.json uses one).
                    continue
                if k not in fields:
                    raise ValueError(f"unknown config key {k!r} for {dc_cls.__name__}")
                f = fields[k]
                nested = {
                    "model": ModelConfig,
                    "optim": OptimConfig,
                    "loss_weights": LossWeights,
                    "augment": AugmentConfig,
                    "distill": DistillConfig,
                }
                if f.name in nested:
                    kwargs[k] = build(nested[f.name], v) if v is not None else None
                elif isinstance(v, list):
                    kwargs[k] = tuple(
                        tuple(e) if isinstance(e, list) else e for e in v
                    )
                else:
                    kwargs[k] = v
            return dc_cls(**kwargs)

        return build(cls, raw)

    def save(self, path: str | Path) -> None:
        Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str | Path) -> "TrainConfig":
        return cls.from_json(Path(path).read_text())
