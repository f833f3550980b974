"""Training-throughput benchmark: Model L (2D) + the 3D patch config.

Line 1 — flagship 2D: end-to-end jitted train-step throughput
(patches/sec/chip) for the reference's Model L (Report.pdf Table 1): 2D
UNet, filters 64..1024, 2 residual units, Focal+Dice, batch 128, 256x256x3
windowed inputs. The step includes on-device windowing + degree-2
augmentation (crop/rot90/flip), forward, loss, backward, Adam, and the
per-step Dice logging — i.e. everything per-step work, which the reference
splits between CPU dataloader workers and the GPU.

Line 2 — 3D volumetric patch training (BASELINE.json config #3; reference
capstone/volumetric/base_trainer.py:58-72): same UNet family in 3D,
native-resolution (128,128,16) patches, CE+Dice, bf16, batch 128 — the
batch chosen by the measured batch/depth sweep (perf/probe_3d_v5e.json;
the batch-2 recipe numbers live in EVIDENCE, not here). The timed loop
includes the on-device random patch
sampling (PatchPipeline3D) plus the full train step, mirroring what the
reference's dataloader + Lightning loop do per step.

Each line is ONE JSON object:
  {"metric", "value" (patches/sec/chip), "unit", "vs_baseline",
   "ms_per_step", "mfu", "model_tflops_per_step", "breakdown": {...}}

- "mfu": achieved model FLOPs/s (analytic conv FLOPs of the UNet, forward
  x3 for fwd+bwd) over the chip's peak bf16 throughput — measured against
  the chip, not against an estimated competitor.
- "breakdown": compiled sub-step times (ms). Components are timed
  separately, so they need not sum exactly to ms_per_step (XLA schedules
  the full step as one program).
- "vs_baseline" compares against an estimated PyTorch+MONAI A100 figure
  because the reference publishes accuracy only; stated openly as an
  estimate. The 2D estimate (~420 patches/s with AMP incl. CPU
  Albumentations) anchors the 3D one by per-patch FLOPs ratio.
"""

import json
import math
import time

import jax
import numpy as np

A100_MONAI_ESTIMATE = 420.0  # patches/sec, torch AMP, see module docstring
V5E_PEAK_BF16 = 197e12  # FLOP/s; consistent with measured 139 TF/s on the
# bottom residual unit alone (perf/probe_sites.py), which rules out the
# 98.5 TF/s interpretation of the v5e spec.

BATCH = 128
RAW = 280  # post-crop slice size of the real pipeline
WARMUP_STEPS = 3
TIMED_STEPS = 20

# 3D patch config (BASELINE.json config #3 model/patch family). Batch 128
# is the measured-throughput batch on v5e (perf/probe_3d_v5e.json: MFU
# 0.024 at the EVIDENCE recipe's batch 2 -> 0.39 at 128; deeper patches
# lose); the batch-2 recipe number lives in EVIDENCE under volumetric_3d.
BATCH_3D = 128
PATCH_3D = (128, 128, 16)  # (H, W, D)
TIMED_STEPS_3D = 10


def unet_fwd_flops(in_channels, channels, strides, num_res_units,
                   input_shape, out_channels, batch, k=3):
    """Analytic conv FLOPs (2*k^nd*prod(spatial_out)*Cin*Cout) of one UNet
    forward, N-D (pass a 2- or 3-tuple spatial `input_shape`).

    Mirrors the architecture in ctseg_tpu/models/unet.py (MONAI recursion);
    InstanceNorm/PReLU FLOPs are negligible and excluded, so the MFU figure
    is slightly conservative.
    """
    nd = len(input_shape)
    kpow = k ** nd
    depth = len(strides)
    total = 0.0

    def conv(spatial_out, cin, cout, kpow_=kpow):
        return 2.0 * kpow_ * math.prod(spatial_out) * cin * cout * batch

    spatial = tuple(input_shape)
    inc = in_channels
    enc_spatial = []
    for i in range(depth):
        s_out = tuple(max(s // strides[i], 1) for s in spatial)
        if num_res_units > 0:
            total += conv(s_out, inc, channels[i])  # unit0 (strided)
            for _ in range(num_res_units - 1):
                total += conv(s_out, channels[i], channels[i])
            total += conv(s_out, inc, channels[i])  # k^nd strided shortcut
        else:
            total += conv(s_out, inc, channels[i])
        enc_spatial.append(s_out)
        inc, spatial = channels[i], s_out
    # bottom (stride 1)
    if num_res_units > 0:
        total += conv(spatial, channels[depth - 1], channels[depth])
        for _ in range(num_res_units - 1):
            total += conv(spatial, channels[depth], channels[depth])
        total += conv(spatial, channels[depth - 1], channels[depth], kpow_=1)
    else:
        total += conv(spatial, channels[depth - 1], channels[depth])

    # decoder
    up_in = channels[depth]
    for i in reversed(range(depth)):
        cin = channels[i] + up_in  # skip concat
        cout = out_channels if i == 0 else channels[i - 1]
        s_in = enc_spatial[i]
        # transposed conv: each input position contributes k^nd taps
        total += 2.0 * kpow * math.prod(s_in) * cin * cout * batch
        s_out = tuple(s * strides[i] for s in s_in)
        if num_res_units > 0:
            total += conv(s_out, cout, cout)
        up_in = cout
    return total


def _sync(x):
    float(jax.numpy.asarray(x).ravel()[0])


def _time(fn, *args, steps=TIMED_STEPS):
    out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def bench_2d():
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.pipeline import DevicePipeline2D
    from ctseg_tpu.training.trainer import TrainConfig, Trainer
    from ctseg_tpu.transforms.pipelines import batched_transform

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=2,
        batch_size=BATCH,
        loss_fx=("Focal", "Dice"),
        exclude_missing=True,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    trainer = Trainer(config)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    n = BATCH * 2
    dataset = PackedDataset2D(
        images=(rng.normal(40, 300, size=(n, RAW, RAW))).astype(np.float32),
        labels=rng.integers(0, 10, size=(n, RAW, RAW)).astype(np.uint8),
        indicators=rng.integers(0, 2, size=(n, 9)).astype(np.float32),
    )
    pipeline = DevicePipeline2D(dataset, BATCH)
    batch = next(pipeline.epoch(jax.random.key(0)))
    key = jax.random.key(1)

    # ---- full step (the headline number)
    for _ in range(WARMUP_STEPS):
        state, metrics = trainer._train_step(state, batch, key)
    # A device->host scalar fetch is the only reliable full sync on remote
    # execution backends (block_until_ready can return early there).
    float(metrics["loss/total"])

    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    step_s = (time.perf_counter() - t0) / TIMED_STEPS
    patches_per_sec = BATCH / step_s

    # ---- component breakdown (separately compiled sub-steps)
    images_raw, labels_raw, indicators = batch

    @jax.jit
    def transform_only(key, images_raw, labels_raw):
        return batched_transform(
            trainer.train_transform, key, images_raw, labels_raw
        )

    images, labels = transform_only(key, images_raw, labels_raw)
    images = images.astype(
        jax.numpy.bfloat16 if on_tpu else jax.numpy.float32
    )

    @jax.jit
    def fwd_bwd(params, images, labels, indicators):
        def loss_fn(p):
            values, _, _ = trainer._losses_and_logits(p, images, labels, indicators)
            return trainer.loss.total(values)

        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def fwd_only(params, images):
        return trainer.model.apply(params, images)

    _, grads = fwd_bwd(state.params, images, labels, indicators)

    @jax.jit
    def opt_only(state, grads):
        from ctseg_tpu.training.optimizer import adam_update

        new_params, _ = adam_update(
            grads, state.opt_state, state.params, state.plateau.lr
        )
        return new_params

    @jax.jit
    def dice_only(params, images, labels):
        from ctseg_tpu.ops import squash_predictions

        logits = trainer.model.apply(params, images).astype(jax.numpy.float32)
        return trainer.dice(squash_predictions(logits), labels)

    t_transform = _time(transform_only, key, images_raw, labels_raw)
    t_fwd = _time(fwd_only, state.params, images)
    t_fwd_bwd = _time(fwd_bwd, state.params, images, labels, indicators)
    t_opt = _time(opt_only, state, grads)
    t_dice = _time(dice_only, state.params, images, labels) - t_fwd

    # ---- MFU
    fwd_flops = unet_fwd_flops(
        in_channels=3, channels=config.filters, strides=(2, 2, 2, 2),
        num_res_units=2,
        input_shape=(config.input_size, config.input_size),
        out_channels=10, batch=BATCH,
    )
    step_flops = 3.0 * fwd_flops  # fwd + ~2x fwd for bwd
    mfu = step_flops / step_s / V5E_PEAK_BF16 if on_tpu else None

    return {
        "metric": "model_l_train_throughput",
        "value": round(patches_per_sec, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / A100_MONAI_ESTIMATE, 3),
        "baseline_is_estimate": True,
        "baseline_source": (
            "A100_MONAI_ESTIMATE=420 patches/s (bench.py docstring); the "
            "reference publishes no throughput. Measure for real with "
            "perf/bench_torch_monai.py on a CUDA host."
        ),
        "ms_per_step": round(step_s * 1000, 2),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "breakdown_ms": {
            "augmentation": round(t_transform * 1000, 2),
            "forward": round(t_fwd * 1000, 2),
            "forward_backward": round(t_fwd_bwd * 1000, 2),
            "optimizer": round(t_opt * 1000, 2),
            "dice_metric": round(max(t_dice, 0.0) * 1000, 2),
        },
    }


def bench_3d():
    """3D native-resolution patch training (BASELINE.json config #3).

    Times the production loop: on-device random patch sampling
    (PatchPipeline3D._sample) + the full jitted train step. MFU uses the
    3D analytic conv FLOPs (k^3 taps). The A100 baseline is the 2D
    estimate scaled by per-patch FLOPs (stated openly as an estimate;
    the reference publishes no 3D throughput).
    """
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=0,
        batch_size=BATCH_3D,
        loss_fx=("CrossEntropy", "Dice"),
        spatial_dims=3,
        input_shape=PATCH_3D,
        in_channels=1,
        compute_dtype="bfloat16" if on_tpu else "float32",
        volumetric_mode="patch",
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
    pipe = PatchPipeline3D(
        dataset, BATCH_3D, patch_size=PATCH_3D, steps_per_epoch=TIMED_STEPS_3D
    )
    key = jax.random.key(1)

    def loop_step(state, s):
        batch = pipe._sample(jax.random.fold_in(key, s))
        return trainer._train_step(state, batch, key)

    for s in range(WARMUP_STEPS):
        state, metrics = loop_step(state, s)
    float(metrics["loss/total"])

    t0 = time.perf_counter()
    for s in range(TIMED_STEPS_3D):
        state, metrics = loop_step(state, s)
    float(metrics["loss/total"])
    step_s = (time.perf_counter() - t0) / TIMED_STEPS_3D
    patches_per_sec = BATCH_3D / step_s

    # ---- component breakdown: sampling vs train step
    t_sample = _time(
        lambda k: pipe._sample(k), jax.random.fold_in(key, 0),
        steps=TIMED_STEPS_3D,
    )
    batch = pipe._sample(jax.random.fold_in(key, 0))
    # _train_step donates its state argument, so the timing loop must chain
    # the returned state instead of re-passing the (now-deleted) input.
    state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS_3D):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    t_step = (time.perf_counter() - t0) / TIMED_STEPS_3D

    fwd_flops = unet_fwd_flops(
        in_channels=1, channels=config.filters, strides=(2, 2, 2, 2),
        num_res_units=2, input_shape=PATCH_3D, out_channels=10,
        batch=BATCH_3D,
    )
    step_flops = 3.0 * fwd_flops
    mfu = step_flops / step_s / V5E_PEAK_BF16 if on_tpu else None

    fwd_flops_2d_patch = unet_fwd_flops(
        in_channels=3, channels=config.filters, strides=(2, 2, 2, 2),
        num_res_units=2, input_shape=(256, 256), out_channels=10, batch=1,
    )
    a100_3d_estimate = A100_MONAI_ESTIMATE * fwd_flops_2d_patch / (
        fwd_flops / BATCH_3D
    )

    return {
        "metric": "unet3d_patch_train_throughput",
        "value": round(patches_per_sec, 3),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / a100_3d_estimate, 3),
        "baseline_is_estimate": True,
        "baseline_source": (
            "2D A100 estimate (420 patches/s) scaled by per-patch FLOPs "
            "ratio; measure for real with perf/bench_torch_monai.py "
            "--dims 3 on a CUDA host."
        ),
        "ms_per_step": round(step_s * 1000, 2),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "patch_size": list(PATCH_3D),
        "batch_size": BATCH_3D,
        "breakdown_ms": {
            "patch_sampling": round(t_sample * 1000, 2),
            "train_step": round(t_step * 1000, 2),
        },
    }


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    print(json.dumps(bench_2d()), flush=True)
    print(json.dumps(bench_3d()), flush=True)


if __name__ == "__main__":
    main()
