"""Full-step Model L throughput: fused conv+IN+PReLU vs unfused (real TPU).

Measures the COMPILED FULL STEP (CLAUDE.md perf rule 3) for the flagship
config at several VMEM budgets (the budget decides which of the 9 stride-1
conv units fuse; the rest fall back to XLA).

Run from /root/repo on the axon TPU:  python perf/measure_fused_step.py
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.training.trainer import TrainConfig, Trainer
import ctseg_tpu.ops.pallas.conv_block as cb

BATCH = 128
RAW = 280
WARMUP = 3
TIMED = 20


def make_batch():
    rng = np.random.default_rng(0)
    n = BATCH
    dataset = PackedDataset2D(
        images=(rng.normal(40, 300, size=(n, RAW, RAW))).astype(np.float32),
        labels=rng.integers(0, 10, size=(n, RAW, RAW)).astype(np.uint8),
        indicators=rng.integers(0, 2, size=(n, 9)).astype(np.float32),
    )
    return next(DevicePipeline2D(dataset, BATCH).epoch(jax.random.key(0)))


def fused_sites(budget):
    """Which Model L stride-1 conv units fuse at this budget (bf16)."""
    sites = [
        ("down0.unit1", 128, 64, 64), ("down1.unit1", 64, 128, 128),
        ("down2.unit1", 32, 256, 256), ("down3.unit1", 16, 512, 512),
        ("bottom.unit0", 16, 512, 1024), ("bottom.unit1", 16, 1024, 1024),
        ("up3_ru", 32, 256, 256), ("up2_ru", 64, 128, 128),
        ("up1_ru", 128, 64, 64),
    ]
    out = []
    for name, hw, cin, cout in sites:
        ct = cb.pick_cout_tile(hw, hw, cin, cout, jax.numpy.bfloat16, budget)
        out.append((name, ct))
    return out


def measure(fused, budget, batch):
    cb.VMEM_BUDGET = budget
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=2, batch_size=BATCH, loss_fx=("Focal", "Dice"),
        exclude_missing=True, compute_dtype="bfloat16", fused_conv=fused,
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    key = jax.random.key(1)
    t_compile = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics = trainer._train_step(state, batch, key)
    loss0 = float(metrics["loss/total"])
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    elapsed = time.perf_counter() - t0
    pps = BATCH * TIMED / elapsed
    return dict(
        fused=fused, budget_mb=budget // 2**20,
        ms_per_step=round(1000 * elapsed / TIMED, 2),
        patches_per_sec=round(pps, 1), loss0=round(loss0, 4),
        compile_s=round(compile_s, 1),
    )


def main():
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    batch = make_batch()

    results = []
    # Baseline: unfused.
    results.append(measure(False, 12 * 2**20, batch))
    print(json.dumps(results[-1]), flush=True)

    for budget_mb in (12, 32, 64):
        budget = budget_mb * 2**20
        print(f"budget {budget_mb}MB sites: {fused_sites(budget)}", flush=True)
        try:
            results.append(measure(True, budget, batch))
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:  # VMEM OOM etc.
            print(f"budget {budget_mb}MB FAILED: {type(e).__name__}: {e}"[:500],
                  flush=True)

    print("SUMMARY")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
