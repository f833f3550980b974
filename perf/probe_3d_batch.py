"""Probe: 3D patch-training step time vs batch size and patch depth.

The EVIDENCE recipe benched batch 2 x (128,128,16) at MFU 0.024 — the deep
UNet levels are starved (spatial (8,8,1) at 1024 channels, tiny MXU tiles).
This probe measures the full jitted train step across batch/patch-depth to
pick the throughput configuration for bench.py's 3D line.

Run on the real chip: python perf/probe_3d_batch.py
"""

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from bench import V5E_PEAK_BF16, unet_fwd_flops  # noqa: E402


def probe(batch, patch):
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
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer._train_step(state, batch_t, key)
    float(metrics["loss/total"])
    step_s = (time.perf_counter() - t0) / steps

    flops = 3.0 * unet_fwd_flops(
        in_channels=1, channels=config.filters, strides=(2, 2, 2, 2),
        num_res_units=2, input_shape=patch, out_channels=10, batch=batch,
    )
    return {
        "batch": batch,
        "patch": list(patch),
        "ms_per_step": round(step_s * 1000, 2),
        "patches_per_sec": round(batch / step_s, 2),
        "mfu": round(flops / step_s / V5E_PEAK_BF16, 4),
    }


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    results = []
    for batch, patch in [
        (2, (128, 128, 16)),
        (4, (128, 128, 16)),
        (8, (128, 128, 16)),
        (16, (128, 128, 16)),
        (32, (128, 128, 16)),
        (64, (128, 128, 16)),
        (128, (128, 128, 16)),
        (4, (128, 128, 32)),
        (8, (128, 128, 32)),
        (16, (128, 128, 32)),
        (2, (128, 128, 48)),
        (4, (128, 128, 48)),
    ]:
        r = probe(batch, patch)
        print(json.dumps(r), flush=True)
        results.append(r)
    best = max(results, key=lambda r: r["mfu"])
    print("best:", json.dumps(best))
    out = {
        "device": jax.devices()[0].device_kind,
        "what": (
            "full jitted 3D patch train step (filters 64..1024, "
            "num_res_units=2, CE+Dice) vs batch size and patch depth"
        ),
        "results": results,
        "best": best,
    }
    with open("perf/probe_3d_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
