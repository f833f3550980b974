"""Interpretability driver (reference capstone/interpretability.py parity).

Loads a trained checkpoint (native dir or released Lightning .ckpt), walks
the test split, skips samples with fewer than 5 annotated structures
(interpretability.py:76-78), and writes prediction/GT overlay panels plus
per-structure GradCAM heatmaps to disk (PNG via matplotlib when available,
.npy always). With `--use_wandb` (or any active wandb run) the overlays and
heatmaps also upload to W&B, like the reference's driver
(interpretability.py:34-48).

Unlike the reference's per-sample loop (one forward + 9 Captum backward
passes per sample, interpretability.py:70-104), qualifying samples run in
fixed-size BATCHES through one jitted forward + vmapped-VJP sweep
(interpret/gradcam.py) — identical per-sample artifacts, ~batch_size x
fewer dispatches.

Usage:
    python -m ctseg_tpu.interpret.run --checkpoint CKPT [--data_dir DIR]
        [--out_dir DIR] [--max_samples 20] [--layer feat_down1]
"""

from argparse import ArgumentParser
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.constants import STRUCTURES
from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.interpret.gradcam import gradcam_all_structures
from ctseg_tpu.ops import squash_predictions
from ctseg_tpu.paths import DEFAULT_DATA_STORAGE
from ctseg_tpu.training.trainer import Trainer
from ctseg_tpu.transforms.pipelines import batched_transform


def _write_sample(out_dir: Path, name: str, img0: np.ndarray,
                  preds: np.ndarray, cams: np.ndarray) -> None:
    """Artifacts for ONE sample: .npy always, overlay PNG when possible,
    and — reference parity (interpretability.py:34-48 logs overlays to a
    W&B project) — upload to an ACTIVE wandb run if one exists."""
    np.save(out_dir / f"{name}_gradcam.npy", cams)
    np.save(out_dir / f"{name}_pred.npy", preds)
    # Upload failures must degrade to disk-only artifacts, matching the
    # CLI's init-failure contract: a transient CommError (or any payload
    # serialization error) on sample k must not abort the remaining
    # samples' .npy/PNG writes. Hence Exception, not just ImportError.
    try:
        import wandb

        if wandb.run is not None:
            base01 = (img0 - img0.min()) / max(
                float(img0.max() - img0.min()), 1e-8
            )
            semantic = wandb.Image(
                np.repeat(base01[..., None], 3, -1),
                masks={
                    "predictions": {
                        "mask_data": preds,
                        "class_labels": {
                            i + 1: s for i, s in enumerate(STRUCTURES)
                        },
                    }
                },
            )
            wandb.log(
                {
                    f"interpret/{name}": semantic,
                    **{
                        f"interpret/{name}_cam_{s}": wandb.Image(cams[s_idx])
                        for s_idx, s in enumerate(STRUCTURES)
                    },
                }
            )
    except Exception as e:
        if not isinstance(e, ImportError):
            print(f"wandb upload failed for {name} ({e!r}); disk-only")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(2, 5, figsize=(20, 8))
    axes = axes.ravel()
    axes[0].imshow(img0, cmap="gray")
    axes[0].set_title(f"{name} (pred overlay)")
    axes[0].imshow(preds, alpha=0.4, cmap="tab10", vmin=0, vmax=9)
    for s_idx, s in enumerate(STRUCTURES):
        ax = axes[s_idx + 1]
        ax.imshow(img0, cmap="gray")
        ax.imshow(cams[s_idx], alpha=0.5, cmap="jet")
        ax.set_title(s)
        ax.axis("off")
    fig.savefig(out_dir / f"{name}_gradcam.png", dpi=80)
    plt.close(fig)


def run_interpretability(trainer, params, dataset, out_dir: Path,
                         max_samples: int = 20, min_structures: int = 5,
                         layer: str = "feat_down1", batch_size: int = 8) -> int:
    """Batched driver: one jitted transform+forward+GradCAM per batch."""
    out_dir.mkdir(parents=True, exist_ok=True)
    model = trainer.model

    @jax.jit
    def step(params, raw, lab):
        img, _ = batched_transform(
            trainer.test_transform, jax.random.key(0), raw, lab
        )
        preds = squash_predictions(model.apply(params, img))
        cams = gradcam_all_structures(model, params, img, layer=layer)
        return img, preds, cams

    keep = [
        i for i in range(len(dataset))
        if dataset.indicators[i].sum() >= min_structures
    ][:max_samples]
    done = 0
    for lo in range(0, len(keep), batch_size):
        idxs = keep[lo : lo + batch_size]
        pad = batch_size - len(idxs)  # static batch shape for the jit cache
        padded = idxs + [idxs[-1]] * pad
        raw = jnp.asarray(
            np.stack([dataset.images[i] for i in padded]), jnp.float32
        )
        lab = jnp.asarray(
            np.stack([dataset.labels[i] for i in padded]), jnp.int32
        )
        img, preds, cams = step(params, raw, lab)
        img, preds, cams = np.asarray(img), np.asarray(preds), np.asarray(cams)
        for j, i in enumerate(idxs):
            _write_sample(
                out_dir, dataset.names[i], img[j, ..., 0], preds[j], cams[j]
            )
            done += 1
    return done


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from ctseg_tpu.models.released import (
        add_released_args,
        resolve_checkpoint_arg,
    )

    parser = ArgumentParser()
    parser.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="native checkpoint dir or a reference Lightning .ckpt file",
    )
    add_released_args(parser)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="interpretability")
    parser.add_argument("--max_samples", type=int, default=20)
    parser.add_argument("--min_structures", type=int, default=5)
    parser.add_argument("--layer", type=str, default="feat_down1")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument(
        "--use_wandb", action="store_true", default=False,
        help="upload overlays/heatmaps to a W&B run (reference "
        "interpretability.py:34-48)",
    )
    parser.add_argument("--experiment_name", type=str, default="interpret")
    args = parser.parse_args()

    wandb_run = None
    if args.use_wandb:
        # Any init failure degrades to disk-only artifacts: not just a
        # missing package, but also offline/unauthenticated environments
        # (wandb raises CommError/UsageError there, not ImportError).
        try:
            import wandb

            wandb_run = wandb.init(
                project="ct-image-segmentation", name=args.experiment_name
            )
        except Exception as e:
            print(f"wandb unavailable ({e!r}); writing artifacts to disk only")

    trainer, state = Trainer.restore(resolve_checkpoint_arg(args))
    data_dir = Path(args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_2d"))
    dataset = PackedDataset2D.load(data_dir / "test_packed.npz")
    try:
        done = run_interpretability(
            trainer, state.params, dataset, Path(args.out_dir),
            max_samples=args.max_samples, min_structures=args.min_structures,
            layer=args.layer, batch_size=args.batch_size,
        )
    finally:
        if wandb_run is not None:
            wandb_run.finish()  # flush uploads even on mid-run failure
    print(f"wrote interpretability artifacts for {done} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
