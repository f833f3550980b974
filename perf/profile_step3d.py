"""Capture a 3D patch-train-step trace on TPU; print per-op-class times.

Same trace-parsing approach as perf/profile_step.py (Chrome trace JSON;
the tensorboard plugin protobufs don't load in this container), applied to
the bench.py 3D configuration: batch 128 x (128,128,16), filters 64..1024,
num_res_units=2, CE+Dice, bf16.

Usage: python perf/profile_step3d.py [batch]
"""

import collections
import glob
import gzip
import json
import re
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.training.trainer import TrainConfig
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

PATCH = (128, 128, 16)


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=0, batch_size=batch,
        loss_fx=("CrossEntropy", "Dice"), spatial_dims=3,
        input_shape=PATCH, in_channels=1, compute_dtype="bfloat16",
        volumetric_mode="patch",
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=PATCH)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    h, w, d = PATCH
    images = jax.numpy.asarray(
        rng.normal(40, 300, size=(batch, h, w, d)).astype(np.float32)
    )
    labels = jax.numpy.asarray(
        rng.integers(0, 10, size=(batch, h, w, d)).astype(np.int32)
    )
    inds = jax.numpy.ones((batch, 9), jax.numpy.float32)
    key = jax.random.key(0)
    batch_t = (images, labels, inds)

    for _ in range(3):
        state, metrics = trainer._train_step(state, batch_t, key)
    float(metrics["loss/total"])

    logdir = f"/tmp/prof3d_b{batch}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        state, metrics = trainer._train_step(state, batch_t, key)
    float(metrics["loss/total"])
    jax.profiler.stop_trace()

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
    raw = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        n = e.get("name", "")
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue  # step envelopes
        agg[re.sub(r"\.\d+$", "", n)] += e.get("dur", 0) / 1000.0 / 5
        raw[n] += e.get("dur", 0) / 1000.0 / 5
    total = sum(agg.values())
    out = {
        "batch": batch,
        "total_ms": round(total, 1),
        "top": [
            {"op": n, "ms": round(d, 2)}
            for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:30]
        ],
        "top_individual": [
            {"op": n, "ms": round(d, 2)}
            for n, d in sorted(raw.items(), key=lambda kv: -kv[1])[:40]
        ],
    }
    print(f"total {total:.1f} ms/step across {len(agg)} op classes")
    for r in out["top"]:
        print(f"{r['ms']:8.2f} ms  {r['op']}")
    with open(f"perf/profile3d_b{batch}_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
