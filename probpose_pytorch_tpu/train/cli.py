"""Training CLI: `python -m probpose_pytorch_tpu.train.cli <out_dir>
[--config cfg.json] [--data-root ...] [--max-steps N]`.

Mirrors the reference entry point (`python -m probpose.train <out_dir>`,
train.py:34-36) with a real config layer on top.
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="ProbPose-TPU training")
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--dataset-format", type=str, default=None,
                        choices=["yolo", "coco", "synthetic"])
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args(argv)

    from probpose_pytorch_tpu.train import TrainConfig, Trainer
    from probpose_pytorch_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )
    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    # Persistent compile cache: a preempted run's replacement process (and
    # any same-config restart) loads the train-step executable instead of
    # recompiling it — the dominant cold-start cost on small hosts.
    enable_compilation_cache()

    # Multi-host: connect to the coordination service BEFORE first device
    # use, so jax.devices() below is the global device list.
    maybe_initialize_distributed()

    cfg = TrainConfig.load(args.config) if args.config else TrainConfig()
    updates: dict = {"out_dir": str(args.out_dir)}
    if args.data_root:
        updates["data_root"] = args.data_root
    if args.dataset_format:
        updates["dataset_format"] = args.dataset_format
    if args.no_resume:
        updates["resume"] = False
    cfg = dataclasses.replace(cfg, **updates)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(args.out_dir / "config.json")

    from probpose_pytorch_tpu.data import (
        SyntheticPoseDataset,
        batch_iterator,
    )

    if cfg.dataset_format == "synthetic":
        train_ds = SyntheticPoseDataset(
            3200, cfg.model.img_size, cfg.model.num_keypoints, seed=1
        )
        val_ds = SyntheticPoseDataset(
            320, cfg.model.img_size, cfg.model.num_keypoints, seed=2
        )
    elif cfg.dataset_format == "mixed":
        from probpose_pytorch_tpu.data.mixed import build_mixed_datasets

        train_ds, val_ds = build_mixed_datasets(cfg)
    elif cfg.dataset_format == "coco":
        from probpose_pytorch_tpu.data.coco import COCOPoseDataset

        root = Path(cfg.data_root)
        kw = dict(resample=cfg.resample) if cfg.resample else {}
        train_ds = COCOPoseDataset(
            root / "annotations/person_keypoints_train2017.json",
            root / "train2017",
            cfg.model.img_size,
            **kw,
        )
        val_ds = COCOPoseDataset(
            root / "annotations/person_keypoints_val2017.json",
            root / "val2017",
            cfg.model.img_size,
            **kw,
        )
    else:
        from probpose_pytorch_tpu.data import YOLOPoseDataset

        kw = dict(resample=cfg.resample) if cfg.resample else {}
        train_ds = YOLOPoseDataset(
            cfg.data_root, "train", cfg.model.img_size, **kw
        )
        val_ds = YOLOPoseDataset(
            cfg.data_root, "valid", cfg.model.img_size, **kw
        )

    if cfg.cache_dir:
        from probpose_pytorch_tpu.data import (
            CachedCropDataset,
            build_crop_cache,
        )

        root = Path(cfg.cache_dir)
        train_ds = CachedCropDataset(
            build_crop_cache(train_ds, root / "train", cfg.num_workers)
        )
        val_ds = CachedCropDataset(
            build_crop_cache(val_ds, root / "val", cfg.num_workers)
        )

    import jax

    steps_per_epoch = max(len(train_ds) // cfg.train_batch_size, 1)
    mesh = None
    if (
        len(jax.devices()) > 1
        or cfg.model_parallel > 1
        or cfg.pipeline_parallel > 1
    ):
        import math

        from probpose_pytorch_tpu.parallel import make_hybrid_mesh, make_mesh

        # The data axis must divide every batch it shards; tiny debug batches
        # (e.g. B=2 on an 8-device host) would otherwise fail at device_put.
        # Use the full hybrid mesh only when its data axis actually divides
        # the batch gcd (magnitude alone is not enough: B=12 on 8 devices has
        # gcd 12 >= 8 but 12 % 8 != 0); otherwise fall back to a gcd-sized
        # sub-mesh.
        max_dp = math.gcd(cfg.train_batch_size, cfg.val_batch_size)
        n_dev = len(jax.devices())
        mp_total = cfg.model_parallel * cfg.pipeline_parallel
        full_dp = n_dev // mp_total
        if cfg.pipeline_parallel > 1:
            dp = math.gcd(max_dp, full_dp) if full_dp else 0
            if dp < 1:
                raise ValueError(
                    f"pipeline_parallel={cfg.pipeline_parallel} * "
                    f"model_parallel={cfg.model_parallel} exceeds the "
                    f"{n_dev} available devices"
                )
            mesh = make_mesh(
                dp * mp_total,
                cfg.model_parallel,
                pipeline_parallel=cfg.pipeline_parallel,
            )
        elif full_dp > 0 and max_dp % full_dp == 0:
            mesh = make_hybrid_mesh(cfg.model_parallel)
        else:
            dp = math.gcd(max_dp, full_dp)
            mesh = make_mesh(dp * cfg.model_parallel, cfg.model_parallel)
    trainer = Trainer.create(cfg, steps_per_epoch, mesh=mesh)

    # Each process loads only its local slice of every global batch; the
    # trainer reassembles global arrays via make_array_from_process_local_data.
    pidx, pcount = jax.process_index(), jax.process_count()
    shard_kw = (
        dict(process_index=pidx, process_count=pcount) if pcount > 1 else {}
    )

    def train_batches():
        return batch_iterator(
            train_ds,
            cfg.train_batch_size,
            shuffle=True,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            **shard_kw,
        )

    def val_batches():
        return batch_iterator(
            val_ds, cfg.val_batch_size, num_workers=cfg.num_workers, **shard_kw
        )

    trainer.fit(train_batches, val_batches, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
