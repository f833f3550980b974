"""Interpretability driver (reference capstone/interpretability.py parity).

Loads a trained checkpoint, walks the test split, skips samples with fewer
than 5 annotated structures (interpretability.py:76-78), and writes
prediction/GT overlay panels plus per-structure GradCAM heatmaps to disk
(PNG via matplotlib when available, .npy always). W&B upload stays optional.

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


def main():
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="interpretability")
    parser.add_argument("--max_samples", type=int, default=20)
    parser.add_argument("--min_structures", type=int, default=5)
    parser.add_argument("--layer", type=str, default="feat_down1")
    args = parser.parse_args()

    trainer, state = Trainer.restore(args.checkpoint)
    data_dir = Path(args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_2d"))
    dataset = PackedDataset2D.load(data_dir / "test_packed.npz")
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    model = trainer.model
    params = state.params
    done = 0
    for i in range(len(dataset)):
        if dataset.indicators[i].sum() < args.min_structures:
            continue
        raw = jnp.asarray(dataset.images[i : i + 1], jnp.float32)
        lab = jnp.asarray(dataset.labels[i : i + 1], jnp.int32)
        key = jax.random.key(0)
        from ctseg_tpu.transforms.pipelines import batched_transform

        img, lab_t = batched_transform(trainer.test_transform, key, raw, lab)
        logits = model.apply(params, img)
        preds = np.asarray(squash_predictions(logits))[0]

        name = dataset.names[i]
        cams = np.asarray(
            gradcam_all_structures(model, params, img, layer=args.layer)
        )[0]  # (9, H, W)
        np.save(out_dir / f"{name}_gradcam.npy", cams)
        np.save(out_dir / f"{name}_pred.npy", preds)

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(2, 5, figsize=(20, 8))
            axes = axes.ravel()
            axes[0].imshow(np.asarray(img)[0, ..., 0], cmap="gray")
            axes[0].set_title(f"{name} (pred overlay)")
            axes[0].imshow(preds, alpha=0.4, cmap="tab10", vmin=0, vmax=9)
            for s_idx, s in enumerate(STRUCTURES):
                ax = axes[s_idx + 1]
                ax.imshow(np.asarray(img)[0, ..., 0], cmap="gray")
                ax.imshow(cams[s_idx], alpha=0.5, cmap="jet")
                ax.set_title(s)
                ax.axis("off")
            fig.savefig(out_dir / f"{name}_gradcam.png", dpi=80)
            plt.close(fig)
        except ImportError:
            pass

        done += 1
        if done >= args.max_samples:
            break
    print(f"wrote interpretability artifacts for {done} samples to {out_dir}")


if __name__ == "__main__":
    main()
