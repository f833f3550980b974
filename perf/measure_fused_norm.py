"""Full-step A/B: fused one-pass IN+PReLU Pallas kernel vs the XLA chain.

Times the complete Model L jitted train step (aug + fwd + loss + bwd + Adam
+ Dice logging) with TrainConfig.fused_norm off and on. Rule 3 of the
project's perf discipline: adopt a micro-optimization only on a full-step
win. Run: python perf/measure_fused_norm.py [reps]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.training.trainer import TrainConfig, Trainer

BATCH = 128


def measure(fused_norm: bool, reps: int) -> float:
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=2, batch_size=BATCH, loss_fx=("Focal", "Dice"),
        exclude_missing=True, compute_dtype="bfloat16",
        fused_norm=fused_norm,
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    ds = PackedDataset2D(
        images=(rng.normal(40, 300, size=(BATCH, 280, 280))).astype(np.float32),
        labels=rng.integers(0, 10, size=(BATCH, 280, 280)).astype(np.uint8),
        indicators=rng.integers(0, 2, size=(BATCH, 9)).astype(np.float32),
    )
    batch = next(DevicePipeline2D(ds, BATCH).epoch(jax.random.key(0)))
    key = jax.random.key(1)
    for _ in range(3):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = measure(False, reps)
    print(f"unfused: {base:.2f} ms/step "
          f"({BATCH / base * 1000:.1f} patches/s)", flush=True)
    fused = measure(True, reps)
    print(f"fused:   {fused:.2f} ms/step "
          f"({BATCH / fused * 1000:.1f} patches/s)  "
          f"speedup {base / fused:.3f}x", flush=True)


if __name__ == "__main__":
    main()
