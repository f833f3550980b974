"""Training-throughput benchmark: Model L on one TPU chip.

Measures end-to-end jitted train-step throughput (patches/sec/chip) for the
flagship configuration — the reference's Model L (Report.pdf Table 1): 2D
UNet, filters 64..1024, 2 residual units, Focal+Dice, batch 128, 256x256x3
windowed inputs. The step includes on-device windowing + degree-2
augmentation (crop/rot90/flip), forward, loss, backward, Adam, and the
per-step Dice logging — i.e. everything per-step work, which the reference
splits between CPU dataloader workers and the GPU.

Prints ONE JSON line:
  {"metric", "value" (patches/sec/chip), "unit", "vs_baseline",
   "ms_per_step", "mfu", "model_tflops_per_step", "breakdown": {...}}

- "mfu": achieved model FLOPs/s (analytic conv FLOPs of the UNet, forward
  x3 for fwd+bwd) over the chip's peak bf16 throughput — measured against
  the chip, not against an estimated competitor.
- "breakdown": compiled sub-step times (ms): on-device augmentation,
  forward+backward, optimizer update, step Dice metric. Components are
  timed separately, so they need not sum exactly to ms_per_step (XLA
  schedules the full step as one program).
- "vs_baseline" compares against an estimated PyTorch+MONAI A100 figure
  (~420 patches/s with AMP incl. CPU Albumentations) because the reference
  publishes accuracy only; stated openly as an estimate.
"""

import json
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


def unet_fwd_flops(in_channels, channels, strides, num_res_units,
                   input_hw, out_channels, batch):
    """Analytic conv FLOPs (2*k^2*HW_out*Cin*Cout) of one UNet forward.

    Mirrors the architecture in ctseg_tpu/models/unet.py (MONAI recursion);
    InstanceNorm/PReLU FLOPs are negligible and excluded, so the MFU figure
    is slightly conservative.
    """
    k2 = 9
    depth = len(strides)
    total = 0.0

    def conv(hw_out, cin, cout, k2_=k2):
        return 2.0 * k2_ * hw_out * hw_out * cin * cout * batch

    hw = input_hw
    inc = in_channels
    enc_hw = []
    for i in range(depth):
        hw_out = hw // strides[i]
        if num_res_units > 0:
            total += conv(hw_out, inc, channels[i])  # unit0 (strided)
            for _ in range(num_res_units - 1):
                total += conv(hw_out, channels[i], channels[i])
            total += conv(hw_out, inc, channels[i])  # k3 strided shortcut
        else:
            total += conv(hw_out, inc, channels[i])
        enc_hw.append(hw_out)
        inc, hw = channels[i], hw_out
    # bottom (stride 1)
    if num_res_units > 0:
        total += conv(hw, channels[depth - 1], channels[depth])
        for _ in range(num_res_units - 1):
            total += conv(hw, channels[depth], channels[depth])
        total += conv(hw, channels[depth - 1], channels[depth], k2_=1)  # 1x1
    else:
        total += conv(hw, channels[depth - 1], channels[depth])

    # decoder
    up_in = channels[depth]
    for i in reversed(range(depth)):
        cin = channels[i] + up_in  # skip concat
        cout = out_channels if i == 0 else channels[i - 1]
        hw_in = enc_hw[i]
        # transposed conv: each input position contributes k^2 taps
        total += 2.0 * k2 * hw_in * hw_in * cin * cout * batch
        hw_out = hw_in * strides[i]
        if num_res_units > 0:
            total += conv(hw_out, cout, cout)
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


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

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
        num_res_units=2, input_hw=config.input_size, out_channels=10,
        batch=BATCH,
    )
    step_flops = 3.0 * fwd_flops  # fwd + ~2x fwd for bwd
    mfu = step_flops / step_s / V5E_PEAK_BF16 if on_tpu else None

    print(
        json.dumps(
            {
                "metric": "model_l_train_throughput",
                "value": round(patches_per_sec, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(patches_per_sec / A100_MONAI_ESTIMATE, 3),
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
        )
    )


if __name__ == "__main__":
    main()
