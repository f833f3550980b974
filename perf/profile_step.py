"""Capture a train-step trace on TPU and print the per-op-category breakdown.

Usage: python perf/profile_step.py [fused_conv: 0|1]
"""

import glob
import json
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.training.trainer import TrainConfig, Trainer

BATCH = 128


def main():
    fused = bool(int(sys.argv[1])) if len(sys.argv) > 1 else False
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=2, batch_size=BATCH, loss_fx=("Focal", "Dice"),
        exclude_missing=True, compute_dtype="bfloat16", fused_conv=fused,
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

    logdir = f"/tmp/prof_fused{int(fused)}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    jax.profiler.stop_trace()

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xplanes)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats^", {}
    )
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns a JSON of tables; dump the device table rows
    # sorted by total self time.
    with open(f"{logdir}/op_stats.json", "w") as f:
        f.write(data if isinstance(data, str) else json.dumps(rows))
    print("written:", f"{logdir}/op_stats.json")


if __name__ == "__main__":
    main()
