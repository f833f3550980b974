"""Probe: attribute the warm IN-LOOP 3D eval rate vs the device-resident rate.

EVIDENCE_r4 `volumetric_3d` recorded 67 vols/min warm in-loop
(evaluate_3d_sliding_window: host staging + upload + windows + Dice + HD95)
vs 266 vols/min "steady-state device-resident" (sliding_window_throughput:
the bare runner re-invoked on device-resident volumes — no staging, no
upload, no metrics). Round-5 history this probe drove: the first
attribution showed a blocking 3.9 s device_put per 131 MB chunk ->
int16 HU + worker-thread staging + depth-only bucketing (93.8 vols/min
with HD95), then the device HD95 itself was cut 131.3 -> 74.0 ms/volume
(perf/probe_hd95_cost.py: Pallas min-plus EDT kernel + k-ary order
statistic) -> 116.5 vols/min. Note the e2e numbers move +-20% run-to-run
with tunnel upload bandwidth (60 MB uploads measured 1.37-3.27 s across
back-to-back runs); the per-chunk attribution is the stable signal.
This probe decomposes the in-loop path on the real chip at the EVIDENCE shape (15 volumes, (27, 280, 280) float32 — the
(40, 512, 512) synth scans after the anatomical crop; patch (128,128,16),
Model-family filters 64..1024) into:

  stage_host_ms     np-pad + np.stack of one GROUP_CHUNK chunk (host CPU)
  upload_ms         jax.device_put of the staged chunk until fetchable
                    (on axon this includes the tunnel transfer)
  group_hd95_ms     the jitted per-chunk program WITH device HD95 (warm)
  group_dice_ms     the same program with with_hd95=False
  runner_ms         the bare sliding-window forward per chunk-equivalent
                    (what the 266 vols/min number times)
  e2e_hd95          full evaluate_3d_sliding_window wall -> vols/min

Conclusions drive (a) whether staging/upload overlap is broken (device_put
blocking over the tunnel would serialize the double-buffer), and (b) how
much of the gap is the REAL metric work (HD95 EDT + Dice) that the
device-resident number simply does not include.

Run on the real chip: python perf/probe_eval_inloop.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N_VOLS = 15
SHAPE = (27, 280, 280)  # post-crop EVIDENCE scan shape (z, y, x)
PATCH = (128, 128, 16)
FILTERS = (64, 128, 256, 512, 1024)


def make_dataset():
    from ctseg_tpu.data.datasets import PackedDataset3D

    rng = np.random.default_rng(0)
    # int16 HU, matching what pack_volumes now carries for PDDCA NRRDs
    # (integer dtype preserved end-to-end; jitted consumers cast on device).
    imgs = [
        rng.integers(-1024, 2000, size=SHAPE).astype(np.int16)
        for _ in range(N_VOLS)
    ]
    labs = [
        rng.integers(0, 10, size=SHAPE).astype(np.uint8) for _ in range(N_VOLS)
    ]
    inds = [np.ones(9, np.float32) for _ in range(N_VOLS)]
    spac = [np.array([3.0, 1.1, 1.1], np.float32) for _ in range(N_VOLS)]
    return PackedDataset3D(imgs, labs, inds, spacings=spac)


def make_trainer():
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    on_tpu = jax.devices()[0].platform == "tpu"
    config = TrainConfig(
        filters=FILTERS, num_res_units=2, transform_degree=0, batch_size=2,
        loss_fx=("CrossEntropy", "Dice"), spatial_dims=3, input_shape=PATCH,
        in_channels=1,
        compute_dtype="bfloat16" if on_tpu else "float32",
        volumetric_mode="patch",
    )
    return make_trainer_3d(config, mode="patch", patch_size=PATCH)


def timeit(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
        arr = jax.tree.leaves(out)[0]
        float(np.asarray(arr).ravel()[0].astype(np.float32))
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from ctseg_tpu.inference import evaluate as ev
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ds = make_dataset()
    trainer = make_trainer()
    state = trainer.init_state()
    params = state.params

    # ---- e2e, warm (second call reuses trainer._swin_cache + jit cache)
    r = ev.evaluate_3d_sliding_window(
        trainer, params, ds, patch_size=PATCH, overlap=0.5, with_hd95=True
    )
    r = ev.evaluate_3d_sliding_window(
        trainer, params, ds, patch_size=PATCH, overlap=0.5, with_hd95=True
    )
    e2e_hd95_vpm = r["vols_per_min"]
    r2 = ev.evaluate_3d_sliding_window(
        trainer, params, ds, patch_size=PATCH, overlap=0.5, with_hd95=False
    )
    r2 = ev.evaluate_3d_sliding_window(
        trainer, params, ds, patch_size=PATCH, overlap=0.5, with_hd95=False
    )
    e2e_dice_vpm = r2["vols_per_min"]

    # ---- device-resident runner rate (what 266 vols/min measured)
    steady = ev.sliding_window_throughput(
        trainer, params, ds, patch_size=PATCH, overlap=0.5, reps=3
    )

    # ---- component attribution on one full GROUP_CHUNK
    from ctseg_tpu.inference.sliding_window import (
        bucketed_grid,
        pad_volume_dhw,
    )

    bucket, starts = bucketed_grid(SHAPE, PATCH, 0.5)
    chunk = list(range(ev.GROUP_CHUNK))

    def stage_host():
        imgs = np.stack(
            [pad_volume_dhw(ds.images[i], bucket, -1024.0) for i in chunk]
        )
        labs = np.stack(
            [pad_volume_dhw(ds.labels[i], bucket, 0) for i in chunk]
        )
        inds = np.stack([ds.indicators[i] for i in chunk])
        spcs = np.stack([ds.spacings[i] for i in chunk])
        st = np.stack([starts for _ in chunk])
        dims = np.stack(
            [np.array([SHAPE[1], SHAPE[2], SHAPE[0]], np.int32)] * len(chunk)
        )
        row_ok = np.ones(len(chunk), bool)
        return imgs, labs, inds, spcs, st, dims, row_ok

    host_args = stage_host()
    stage_host_ms = timeit(lambda: (stage_host(), None)[1], reps=3)

    def upload():
        return tuple(jax.device_put(x) for x in host_args)

    upload_ms = timeit(upload, reps=3)
    dev_args = upload()
    chunk_bytes = sum(x.nbytes for x in host_args)

    # Time the group program through the public API on a dataset that is
    # EXACTLY one full chunk (no double-buffer, one dispatch), with
    # staging/upload measured above subtracted out.
    from ctseg_tpu.data.datasets import PackedDataset3D

    one_chunk = PackedDataset3D(
        [ds.images[i] for i in chunk],
        [ds.labels[i] for i in chunk],
        [ds.indicators[i] for i in chunk],
        spacings=[ds.spacings[i] for i in chunk],
    )

    def e2e_chunk(with_hd95):
        def f():
            return ev.evaluate_3d_sliding_window(
                trainer, params, one_chunk, patch_size=PATCH, overlap=0.5,
                with_hd95=with_hd95,
            )["vols_per_min"]

        f()  # warm compile
        t0 = time.perf_counter()
        v = f()
        return (time.perf_counter() - t0) * 1000.0, v

    chunk_hd95_ms, _ = e2e_chunk(True)
    chunk_dice_ms, _ = e2e_chunk(False)
    group_hd95_ms = chunk_hd95_ms - stage_host_ms - upload_ms
    group_dice_ms = chunk_dice_ms - stage_host_ms - upload_ms

    runner_ms_per_vol = steady["ms_per_volume"]

    out = {
        "device": jax.devices()[0].device_kind,
        "shape": list(SHAPE),
        "patch": list(PATCH),
        "n_vols": N_VOLS,
        "group_chunk": ev.GROUP_CHUNK,
        "e2e_hd95_vols_per_min": round(e2e_hd95_vpm, 1),
        "e2e_dice_only_vols_per_min": round(e2e_dice_vpm, 1),
        "device_resident_runner_vols_per_min": round(steady["vols_per_min"], 1),
        "per_chunk_ms": {
            "stage_host": round(stage_host_ms, 1),
            "upload_device_put": round(upload_ms, 1),
            "upload_bytes_mb": round(chunk_bytes / 1e6, 1),
            "e2e_one_chunk_with_hd95": round(chunk_hd95_ms, 1),
            "e2e_one_chunk_dice_only": round(chunk_dice_ms, 1),
            "group_program_with_hd95_est": round(group_hd95_ms, 1),
            "group_program_dice_only_est": round(group_dice_ms, 1),
            "runner_only_8_vols": round(runner_ms_per_vol * len(chunk), 1),
        },
        "notes": (
            "group_program_* = one-chunk e2e minus measured stage+upload; "
            "hd95-vs-dice delta isolates the on-device EDT+order-statistic "
            "cost; runner_only is what the 'steady-state device-resident' "
            "number times (no windowing, metrics, staging, or upload)"
        ),
    }
    print(json.dumps(out, indent=1))
    with open("perf/probe_eval_inloop_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
