"""Full-step A/B for the packed-polyphase up0 FORWARD (ops/shallow_grad.py::
conv_transpose_smallc fwd_mode="packed") on the 3D patch-training config.

Rule 3 (CLAUDE.md): the site probe (perf/probe_transp3d.py: fwd 9.4 vs
12.4 ms, and the combined packed-fwd + reformulated-bwd predicts ~15.9 vs
18.9 ms at the up0 transposed conv) does not decide adoption — the compiled
FULL step does. Times bench.py's bench_3d train step twice in one process,
toggling TrainConfig.packed_up_fwd, interleaved A/B/A/B to cancel tunnel
drift.

Run on the real chip: python perf/ab_packed_up_step.py
Verdict artifact: perf/ab_packed_up_step_v5e.json
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from ctseg_tpu.data.datasets import PackedDataset3D
from ctseg_tpu.training.trainer import TrainConfig
from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

PATCH_3D = (128, 128, 16)
BATCH_3D = 128
STEPS = 20


def build_step(packed_up: bool):
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=0,
        batch_size=BATCH_3D,
        loss_fx=("CrossEntropy", "Dice"),
        spatial_dims=3,
        input_shape=PATCH_3D,
        in_channels=1,
        compute_dtype="bfloat16",
        volumetric_mode="patch",
        packed_up_fwd=packed_up,
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=PATCH_3D)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    n_vols, h, w, dmax = 4, 280, 280, 120
    dataset = PackedDataset3D(
        images=[rng.normal(40, 300, size=(dmax, h, w)).astype(np.float32)
                for _ in range(n_vols)],
        labels=[rng.integers(0, 10, size=(dmax, h, w)).astype(np.uint8)
                for _ in range(n_vols)],
        indicators=[np.ones(9, np.float32)] * n_vols,
    )
    pipe = PatchPipeline3D(dataset, BATCH_3D, patch_size=PATCH_3D,
                           steps_per_epoch=STEPS)
    batch = jax.tree.map(
        jax.block_until_ready, pipe._sample(jax.random.key(7))
    )
    key = jax.random.key(1)

    def step(state):
        return trainer._train_step(state, batch, key)

    return step, state


def main():
    assert jax.devices()[0].platform == "tpu", "run on the real chip"
    step_p, state_p = build_step(True)
    for _ in range(3):
        state_p, m = step_p(state_p)
    float(m["loss/total"])

    step_n, state_n = build_step(False)
    for _ in range(3):
        state_n, m = step_n(state_n)
    float(m["loss/total"])

    def _run_packed():
        nonlocal state_p
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state_p, m = step_p(state_p)
        float(m["loss/total"])
        times["packed"].append((time.perf_counter() - t0) / STEPS * 1e3)

    def _run_native():
        nonlocal state_n
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state_n, m = step_n(state_n)
        float(m["loss/total"])
        times["native"].append((time.perf_counter() - t0) / STEPS * 1e3)

    times = {"packed": [], "native": []}
    # Interleave to cancel drift; alternate which variant goes first per
    # round so ordering/HBM-residency bias cancels too (the measured delta
    # is ~0.4%, the same order as a fixed-order bias).
    for rnd in range(4):
        if rnd % 2 == 0:
            _run_packed(); _run_native()
        else:
            _run_native(); _run_packed()

    out = {
        "device": jax.devices()[0].device_kind,
        "what": "3D patch train step (bench_3d config): packed up0 fwd vs native",
        "batch": BATCH_3D,
        "patch": PATCH_3D,
        "packed_ms": times["packed"],
        "native_ms": times["native"],
        "packed_ms_min": min(times["packed"]),
        "native_ms_min": min(times["native"]),
        "speedup_min": min(times["native"]) / min(times["packed"]),
    }
    print(json.dumps(out, indent=1))
    with open("perf/ab_packed_up_step_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()


