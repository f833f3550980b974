"""3D sliding-window throughput: eval-path vols/min + pure-runner steady state.

Reuses the cached evidence workspace's packed 3D test split (run
`python perf/make_evidence.py --workspace /tmp/evidence_ws` first, or pass
--data <dir containing test_packed.npz>).  Run: python perf/probe_swin.py
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ctseg_tpu.data.datasets import PackedDataset3D
from ctseg_tpu.inference.evaluate import evaluate_3d_sliding_window
from ctseg_tpu.inference.sliding_window import build_sliding_window_fn
from ctseg_tpu.training.trainer import TrainConfig
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

PATCH = (128, 128, 16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/evidence_ws/miccai_3d")
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    test = PackedDataset3D.load(f"{args.data}/test_packed.npz")
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024), num_res_units=2,
        transform_degree=0, batch_size=2, loss_fx=("CrossEntropy",),
        spatial_dims=3, input_shape=PATCH, in_channels=1,
        compute_dtype="bfloat16", volumetric_mode="patch",
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=PATCH)
    state = trainer.init_state()

    if not args.skip_eval:
        # Eval path (windowing + padding + Dice per volume), compile
        # included then steady.
        for tag in ("incl-compile", "steady"):
            r = evaluate_3d_sliding_window(
                trainer, state.params, test, patch_size=PATCH, overlap=0.5
            )
            print(
                f"eval path [{tag}]: {r['vols_per_min']:.1f} vols/min",
                flush=True,
            )

    # Isolate transfer vs compute: stacked transfer, then the full
    # per-volume pipeline (window+pad+runner+squash+dice) via lax.map on
    # device-resident inputs.
    from ctseg_tpu.metrics import dice_per_sample_class
    from ctseg_tpu.ops import squash_predictions
    from ctseg_tpu.transforms.windowing import apply_window

    imgs = np.stack(list(test.images))
    labs = np.stack(list(test.labels))
    t0 = time.perf_counter()
    imgs_d = jnp.asarray(imgs)
    labs_d = jnp.asarray(labs)
    float(imgs_d.ravel()[0]); float(labs_d.ravel()[0].astype(jnp.float32))
    print(f"stacked transfer: {time.perf_counter()-t0:.2f} s", flush=True)

    d, h, w = test.images[0].shape
    hp = tuple(max(s_, p) for s_, p in zip((h, w, d), PATCH))
    runner2 = build_sliding_window_fn(
        trainer.model.apply, hp, PATCH, overlap=0.5, batch_size=4,
        out_channels=10,
    )

    def one(params, img, lab):
        vol = jnp.moveaxis(img.astype(jnp.float32), 0, -1)[..., None]
        vol = apply_window(vol, 350, 20, shift=True)
        pads = [(0, max(0, p - s_)) for s_, p in zip(vol.shape[:3], PATCH)] + [(0, 0)]
        logits = runner2(params, jnp.pad(vol, pads))[:h, :w, :d]
        preds = squash_predictions(logits)
        target = jnp.moveaxis(lab.astype(jnp.int32), 0, -1)
        dice, valid = dice_per_sample_class(preds[None], target[None])
        return dice[0], valid[0]

    group = jax.jit(
        lambda params, i, l: jax.lax.map(lambda t: one(params, *t), (i, l))
    )
    out = group(state.params, imgs_d, labs_d)
    float(out[0].ravel()[0])
    t0 = time.perf_counter()
    out = group(state.params, imgs_d, labs_d)
    float(out[0].ravel()[0])
    dt = time.perf_counter() - t0
    print(f"group lax.map on-device: {dt:.2f} s "
          f"({len(test.images) / dt * 60:.1f} vols/min)", flush=True)

    single = jax.jit(one)
    dv, vv = single(state.params, imgs_d[0], labs_d[0])
    float(dv.ravel()[0])
    t0 = time.perf_counter()
    for i in range(len(test.images)):
        dv, vv = single(state.params, imgs_d[i], labs_d[i])
    float(dv.ravel()[0])
    dt = time.perf_counter() - t0
    print(f"per-volume jit on-device: {dt:.2f} s "
          f"({len(test.images) / dt * 60:.1f} vols/min)", flush=True)

    # Pure inference: one staged padded volume, runner only.
    img = test.images[0]
    vol = jnp.moveaxis(jnp.asarray(img, jnp.float32), 0, -1)[..., None]
    pads = [(0, max(0, p - s)) for s, p in zip(vol.shape[:3], PATCH)] + [(0, 0)]
    vol_p = jnp.pad(vol, pads)
    runner = build_sliding_window_fn(
        trainer.model.apply, vol_p.shape[:3], PATCH, overlap=0.5,
        batch_size=4, out_channels=10,
    )
    out = runner(state.params, vol_p)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = runner(state.params, vol_p)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"pure runner: {60.0 / dt:.1f} vols/min ({dt * 1000:.1f} ms/vol)")


if __name__ == "__main__":
    main()
