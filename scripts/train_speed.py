"""Training-step throughput on the real chip + attention implementation
comparison. Usage: python -u scripts/train_speed.py [batch]"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import numpy as np
import jax
import jax.numpy as jnp

from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.train import TrainConfig, Trainer
from probpose_pytorch_tpu.utils.compilation_cache import enable_compilation_cache
from probpose_pytorch_tpu.utils.profiling import measure_fn_time

enable_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = TrainConfig(
    model=ModelConfig(
        img_size=(256, 192), num_keypoints=17, backbone="vit-s",
        compute_dtype="bfloat16",
        deconv_out_channels=(256, 256), deconv_kernel_sizes=(4, 4),
        pool_sizes=((4, 3), (2, 2), (2, 2)), normalize=1.0,
        attn_impl="fused",
    ),
    train_batch_size=B,
    out_dir="/tmp/train_speed",
)
trainer = Trainer.create(cfg, steps_per_epoch=1000)
ds = SyntheticPoseDataset(B, cfg.model.img_size, 17)
batch = {k: jnp.asarray(v) for k, v in next(iter(batch_iterator(ds, B, num_workers=4))).items()}

# Chain steps through the param state for honest timing.
from probpose_pytorch_tpu.train.loop import make_train_step

step = make_train_step(trainer.model, trainer.encode_codec, trainer.loss_fn, trainer.tx, cfg)

from functools import partial
import time


@partial(jax.jit, static_argnums=(2,))
def chained(state, batch, n):
    def body(_, s):
        s2, _ = step(s, batch)
        return s2
    final = jax.lax.fori_loop(0, n, body, state)
    # Fetch a param-dependent scalar so the loop body cannot be DCE'd.
    return sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in jax.tree_util.tree_leaves(final.params))


def timed(n):
    t0 = time.perf_counter()
    float(chained(trainer.state, batch, n))
    return time.perf_counter() - t0


timed(1); timed(4)
import statistics
samples = []
for _ in range(3):
    samples.append((timed(4) - timed(1)) / 3)
per = statistics.median(samples)
print(f"train step: {per*1e3:.1f} ms/step  {B/per:.0f} crops/s training throughput (B={B})")
