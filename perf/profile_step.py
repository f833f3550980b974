"""Capture a train-step trace on TPU and print the per-op-category breakdown.

Usage: python perf/profile_step.py [fused_conv: 0|1] [fused_norm: 0|1]
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
    fused_norm = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=2, batch_size=BATCH, loss_fx=("Focal", "Dice"),
        exclude_missing=True, compute_dtype="bfloat16", fused_conv=fused,
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

    logdir = f"/tmp/prof_fused{int(fused)}_{int(fused_norm)}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    jax.profiler.stop_trace()

    # Parse the Chrome trace directly (the tensorboard profile plugin's
    # protobufs are incompatible with this container's protobuf version).
    import collections
    import gzip
    import re

    traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        n = e.get("name", "")
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue  # step envelopes
        agg[re.sub(r"\.\d+$", "", n)] += e.get("dur", 0) / 1000.0 / 5
    total = sum(agg.values())
    print(f"total {total:.1f} ms/step across {len(agg)} op classes")
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d:8.2f} ms  {n}")


if __name__ == "__main__":
    main()
