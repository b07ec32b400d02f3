"""Learning smoke test: the full fused train step actually learns.

On the synthetic blob dataset (keypoints are literally rendered into the
image), a tiny model must lift keypoint PCK and in-image probability accuracy
well above their initialization levels within 150 steps.
"""

import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer

ViTConfig.PRESETS.setdefault(
    "vit-conv-test", dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0)
)


def test_training_learns_keypoints(tmp_path):
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48),
            num_keypoints=5,
            backbone="vit-conv-test",
            compute_dtype="float32",
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        train_batch_size=16,
        out_dir=str(tmp_path),
    )
    trainer = Trainer.create(cfg, steps_per_epoch=150)
    ds = SyntheticPoseDataset(64, cfg.model.img_size, 5, seed=1)
    state = trainer.state

    batch0 = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, 16, num_workers=1))).items()
    }
    m0 = trainer.eval_step(state, batch0)
    pck0 = float(m0["acc/kpt"])

    step = 0
    for epoch in range(100):
        for batch in batch_iterator(
            ds, 16, shuffle=True, seed=0, epoch=epoch, num_workers=2
        ):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, _ = trainer.train_step(state, batch)
            step += 1
            if step >= 150:
                break
        if step >= 150:
            break

    m1 = trainer.eval_step(state, batch0)
    pck1 = float(m1["acc/kpt"])
    prob0 = float(m0["acc/probability"])
    prob1 = float(m1["acc/probability"])
    assert pck1 > max(0.2, pck0 + 0.15), (pck0, pck1)
    assert prob1 > max(0.7, prob0), (prob0, prob1)
