"""Training callbacks: periodic example-overlay logging.

Capability parity with the reference's ExamplesLoggingCallback
(capstone/training/callbacks.py:9-105): every `every_n_epochs` epochs, run
the model on a fixed random subset of validation samples and write
prediction/ground-truth overlay panels — to PNG files on disk, plus, when a
W&B run is active, semantic segmentation images with per-class mask layers
and class labels ({0: "Void", 1..9: STRUCTURES}), exactly the reference's
wandb.Image(masks={"predictions", "ground_truth"}) contract
(capstone/training/callbacks.py:80-105).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.constants import STRUCTURES
from ctseg_tpu.ops import squash_predictions
from ctseg_tpu.transforms.pipelines import batched_transform
from ctseg_tpu.utils.visualize import overlay_labels

# {0: "Void", 1: "BrainStem", ...} — capstone/training/callbacks.py:84-85.
CLASS_LABELS = {0: "Void", **{i + 1: s for i, s in enumerate(STRUCTURES)}}


class ExamplesLoggingCallback:
    def __init__(
        self,
        dataset,
        out_dir,
        every_n_epochs: int = 25,
        max_examples: int = 8,
        seed: int = 12342,
    ):
        self.dataset = dataset
        self.out_dir = Path(out_dir)
        self.every = every_n_epochs
        rng = np.random.default_rng(seed)
        n = min(max_examples, len(dataset))
        self.indices = rng.choice(len(dataset), size=n, replace=False)

    def __call__(self, trainer, state, epoch: int) -> None:
        if (epoch + 1) % self.every != 0:
            return
        out = self.out_dir / f"epoch_{epoch + 1:04d}"
        out.mkdir(parents=True, exist_ok=True)

        images = jnp.asarray(self.dataset.images[self.indices], jnp.float32)
        labels = jnp.asarray(self.dataset.labels[self.indices], jnp.int32)
        img_t, lab_t = batched_transform(
            trainer.test_transform, jax.random.key(0), images, labels
        )
        logits = trainer.model.apply(state.params, img_t)
        if getattr(trainer.config, "exclude_missing", False):
            # Zero the logits of structures absent from the annotation
            # (no indicator for background) before squashing — the
            # reference's exclude_missing display path
            # (capstone/training/callbacks.py:70-75).
            ind = jnp.asarray(
                self.dataset.indicators[self.indices], logits.dtype
            )
            ind = ind[:, None, None, :]  # (N, 1, 1, S) over (N, H, W, C)
            logits = jnp.concatenate(
                [logits[..., :1], logits[..., 1:] * ind], axis=-1
            )
        preds = np.asarray(squash_predictions(logits))
        img_np = np.asarray(img_t)
        lab_np = np.asarray(lab_t)

        for j, idx in enumerate(self.indices):
            base = img_np[j, ..., 0]
            base01 = (base - base.min()) / max(base.max() - base.min(), 1e-8)
            panel = np.concatenate(
                [
                    np.repeat(base01[..., None], 3, -1),
                    overlay_labels(base01, preds[j]),
                    overlay_labels(base01, lab_np[j]),
                ],
                axis=1,
            )
            name = self.dataset.names[idx]
            np.save(out / f"{name}.npy", panel)
            try:  # reference parity: push semantic masks to an active W&B run
                import wandb

                if wandb.run is not None:
                    semantic = wandb.Image(
                        np.repeat(base01[..., None], 3, -1),
                        masks={
                            "predictions": {
                                "mask_data": preds[j],
                                "class_labels": CLASS_LABELS,
                            },
                            "ground_truth": {
                                "mask_data": lab_np[j],
                                "class_labels": CLASS_LABELS,
                            },
                        },
                    )
                    wandb.log(
                        {
                            f"examples/{name}": semantic,
                            f"examples/{name}_panel": wandb.Image(panel),
                        },
                        step=int(state.step),
                    )
            except ImportError:
                pass
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                fig, ax = plt.subplots(figsize=(12, 4))
                ax.imshow(panel)
                ax.set_title(f"{name}: input | prediction | ground truth")
                ax.axis("off")
                fig.savefig(out / f"{name}.png", dpi=80, bbox_inches="tight")
                plt.close(fig)
            except ImportError:
                pass
