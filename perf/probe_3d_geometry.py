"""Probe: 3D patch GEOMETRY sweep at a constant voxel budget.

Round 4's roofline (perf/roofline3d_v5e.json) measured the (128,128,16)
batch-128 step at 244.9 ms vs 106.2 ms attainable, with the big MXU-bound
mid sites running at 0.43-0.68 efficiency. At that geometry the deep
levels' depth extents collapse to 4/2/1 voxels, so 3^3 kernels waste most
of their depth taps and conv tiles are thin along depth — the prime
suspect for the mid-site gap.

This probe holds the per-step voxel budget fixed (~33.5M voxels = the
batch-128 x (128,128,16) budget) and sweeps the patch aspect, timing the
FULL jitted train step (same recipe as bench.py's 3D line: filters
64..1024, num_res_units=2, CE+Dice, bf16). Figures of merit:

- voxels_per_sec: the budget-neutral throughput (patches differ in size
  across geometries, so patches/sec is not comparable here);
- mfu: accounts for the small FLOPs/voxel differences from deep-level
  rounding (max(s//2,1)).

Patch geometry is a free parameter of the north-star config (BASELINE.json
config #3 fixes the model family + native-resolution patches, not the
patch aspect); the reference's 3D path trains on whole resized volumes
(capstone/volumetric/base_trainer.py:88-99) and publishes no throughput.

Run on the real chip: python perf/probe_3d_geometry.py
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from bench import V5E_PEAK_BF16, unet_fwd_flops  # noqa: E402

# (batch, (H, W, D)) — all within 1.6% of 33.55M voxels/step.
CONFIGS = [
    (128, (128, 128, 16)),  # current default: deep depth extents 4/2/1
    (64, (128, 128, 32)),
    (32, (128, 128, 64)),
    (112, (96, 96, 32)),
    (56, (96, 96, 64)),
    (128, (64, 64, 64)),
    (256, (64, 64, 32)),
]


def probe(batch, patch, steps=10):
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    on_tpu = jax.devices()[0].platform == "tpu"
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=0,
        batch_size=batch,
        loss_fx=("CrossEntropy", "Dice"),
        spatial_dims=3,
        input_shape=patch,
        in_channels=1,
        compute_dtype="bfloat16" if on_tpu else "float32",
        volumetric_mode="patch",
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=patch)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    h, w, d = patch
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
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer._train_step(state, batch_t, key)
    float(metrics["loss/total"])
    step_s = (time.perf_counter() - t0) / steps

    flops = 3.0 * unet_fwd_flops(
        in_channels=1, channels=config.filters, strides=(2, 2, 2, 2),
        num_res_units=2, input_shape=patch, out_channels=10, batch=batch,
    )
    voxels = batch * h * w * d
    return {
        "batch": batch,
        "patch": list(patch),
        "voxels_per_step": voxels,
        "ms_per_step": round(step_s * 1000, 2),
        "patches_per_sec": round(batch / step_s, 2),
        "mvoxels_per_sec": round(voxels / step_s / 1e6, 2),
        "step_tflops": round(flops / 1e12, 2),
        "mfu": round(flops / step_s / V5E_PEAK_BF16, 4),
    }


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    results = []
    for batch, patch in CONFIGS:
        try:
            r = probe(batch, patch)
        except Exception as e:  # e.g. HBM OOM on the 16G v5e — record, go on
            r = {
                "batch": batch,
                "patch": list(patch),
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }
        print(json.dumps(r), flush=True)
        results.append(r)
    ok = [r for r in results if "error" not in r]
    best = max(ok, key=lambda r: r["mvoxels_per_sec"])
    print("best:", json.dumps(best))
    out = {
        "device": jax.devices()[0].device_kind,
        "what": (
            "full jitted 3D patch train step (filters 64..1024, "
            "num_res_units=2, CE+Dice, bf16) across patch geometries at a "
            "constant ~33.5M-voxel/step budget"
        ),
        "results": results,
        "best_by_voxel_throughput": best,
    }
    with open("perf/probe_3d_geometry_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
