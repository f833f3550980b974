"""Probe: where the 3D patch train step spends its time (batch 16/32).

Components compiled separately: forward, forward+backward, loss-only,
optimizer, the windowing transform, and the per-step dice metric. Also
tries batch 32 for the headline step.

Run on the real chip: python perf/probe_3d_breakdown.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import V5E_PEAK_BF16, unet_fwd_flops  # noqa: E402

PATCH = (128, 128, 16)


def make(batch):
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=0,
        batch_size=batch,
        loss_fx=("CrossEntropy", "Dice"),
        spatial_dims=3,
        input_shape=PATCH,
        in_channels=1,
        compute_dtype="bfloat16",
        volumetric_mode="patch",
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=PATCH)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    h, w, d = PATCH
    images = jnp.asarray(
        rng.normal(40, 300, size=(batch, h, w, d)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.integers(0, 10, size=(batch, h, w, d)).astype(np.int32)
    )
    inds = jnp.ones((batch, 9), jnp.float32)
    return trainer, state, (images, labels, inds)


def timeit(fn, *args, steps=10):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps


def step_time(trainer, state, batch, steps=10):
    key = jax.random.key(0)
    state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = trainer._train_step(state, batch, key)
    float(metrics["loss/total"])
    return (time.perf_counter() - t0) / steps


def main():
    from ctseg_tpu.ops import squash_predictions
    from ctseg_tpu.transforms.pipelines import batched_transform

    for batch in (16, 32):
        trainer, state, batch_t = make(batch)
        images_raw, labels_raw, inds = batch_t
        key = jax.random.key(1)

        t_full = step_time(trainer, state, batch_t)
        trainer2, state, _ = make(batch)  # fresh state (donated above)

        @jax.jit
        def transform_only(key, images_raw, labels_raw):
            return batched_transform(
                trainer2.train_transform, key, images_raw, labels_raw
            )

        images, labels = transform_only(key, images_raw, labels_raw)
        images = images.astype(jnp.bfloat16)

        @jax.jit
        def fwd_only(params, images):
            return trainer2.model.apply(params, images)

        @jax.jit
        def fwd_bwd(params, images, labels, inds):
            def loss_fn(p):
                values, _, _ = trainer2._losses_and_logits(
                    p, images, labels, inds
                )
                return trainer2.loss.total(values)

            return jax.value_and_grad(loss_fn)(params)

        logits = fwd_only(state.params, images)

        @jax.jit
        def loss_only(logits, labels, inds):
            values = trainer2.loss(
                logits.astype(jnp.float32), labels, inds, None, None
            )
            return trainer2.loss.total(values)

        @jax.jit
        def dice_only(logits, labels):
            return trainer2.dice(
                squash_predictions(logits.astype(jnp.float32)), labels
            )

        t_tr = timeit(transform_only, key, images_raw, labels_raw)
        t_fwd = timeit(fwd_only, state.params, images)
        t_fb = timeit(fwd_bwd, state.params, images, labels, inds)
        t_loss = timeit(loss_only, logits, labels, inds)
        t_dice = timeit(dice_only, logits, labels)

        flops = 3.0 * unet_fwd_flops(
            in_channels=1, channels=(64, 128, 256, 512, 1024),
            strides=(2, 2, 2, 2), num_res_units=2, input_shape=PATCH,
            out_channels=10, batch=batch,
        )
        print(json.dumps({
            "batch": batch,
            "full_ms": round(t_full * 1000, 2),
            "transform_ms": round(t_tr * 1000, 2),
            "fwd_ms": round(t_fwd * 1000, 2),
            "fwd_bwd_ms": round(t_fb * 1000, 2),
            "loss_ms": round(t_loss * 1000, 2),
            "dice_ms": round(t_dice * 1000, 2),
            "patches_per_sec": round(batch / t_full, 1),
            "mfu": round(flops / t_full / V5E_PEAK_BF16, 4),
            "fwd_bwd_mfu": round(flops / t_fb / V5E_PEAK_BF16, 4),
            "fwd_mfu": round(
                (flops / 3.0) / t_fwd / V5E_PEAK_BF16, 4
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
