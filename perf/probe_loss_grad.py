"""Microbench: fwd+bwd of Focal+Dice loss, gather vs dense-one-hot forms.

A take_along_axis gather of the target-class probability differentiates to
a scatter-add over every voxel; measured (v5e, bf16, 128x256x256x10):
gather ~143 ms vs dense ~10-15 ms per loss. The framework losses are the
dense forms; the gather variants are kept inline here as the record of why.
Run: python perf/probe_loss_grad.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.losses.segmentation import dice_loss, focal_loss

N, H, W, C = 128, 256, 256, 10


def gather_focal(logits, labels, gamma=2.0):
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    logp_y = (
        jnp.take_along_axis(logits, labels[..., None], axis=-1) - logz
    )[..., 0]
    per_voxel = -jnp.power(1.0 - jnp.exp(logp_y), gamma) * logp_y
    return jnp.sum(per_voxel) / (per_voxel.size * C)


def gather_dice(logits, labels, smooth=1e-5):
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    p_y = jnp.exp(jnp.take_along_axis(logits, labels[..., None], axis=-1) - logz)[
        ..., 0
    ]
    target = jax.nn.one_hot(labels, C, dtype=p_y.dtype)
    inter = jnp.sum(target * p_y[..., None], axis=(1, 2))[..., 1:]
    target_o = jnp.sum(target, axis=(1, 2))[..., 1:]
    pred_o = jnp.sum(jnp.exp(logits - logz), axis=(1, 2))[..., 1:]
    return jnp.mean(1.0 - (2.0 * inter + smooth) / (target_o + pred_o + smooth))


def dense_focal(logits, labels, gamma=2.0):
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, C, dtype=logp.dtype)
    logp_y = jnp.sum(onehot * logp, axis=-1)
    per_voxel = -jnp.power(1.0 - jnp.exp(logp_y), gamma) * logp_y
    return jnp.sum(per_voxel) / (per_voxel.size * C)


def dense_dice(logits, labels, smooth=1e-5):
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, C, dtype=probs.dtype)
    axes = (1, 2)
    inter = jnp.sum(onehot * probs, axis=axes)[..., 1:]
    denom = (jnp.sum(onehot, axes) + jnp.sum(probs, axes))[..., 1:]
    return jnp.mean(1.0 - (2.0 * inter + smooth) / (denom + smooth))


def timeit(name, fn, *args):
    g = jax.jit(jax.grad(fn))
    out = g(*args)
    jax.block_until_ready(out)
    float(out.reshape(-1)[0])  # force full sync
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = g(*args)
    float(jax.block_until_ready(out).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, C, size=(N, H, W)), jnp.int32)

    timeit("focal gather", gather_focal, logits, labels)
    timeit("focal dense one-hot", dense_focal, logits, labels)
    timeit("focal framework", lambda x: focal_loss(x, labels), logits)
    timeit("dice gather", gather_dice, logits, labels)
    timeit("dice dense one-hot", dense_dice, logits, labels)
    timeit("dice framework", lambda x: dice_loss(x, labels), logits)


if __name__ == "__main__":
    main()
