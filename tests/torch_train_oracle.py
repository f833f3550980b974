"""Plain-torch TRAINING-step oracle: losses + Adam trajectory.

Extends tests/torch_unet_oracle.py (forward wiring) to the full training
dynamics the reference runs: Focal + Dice losses implemented in plain torch
from the cited formulas, summed total (capstone/training/base_trainer.py:110),
torch.optim.Adam lr=1e-3 (base_trainer.py:138-139), and the mixup variant's
lambda-combined per-loss values (capstone/training/mixup_trainer.py:52-92).

Loss contracts (same citations as ctseg_tpu/losses/segmentation.py):
  - Dice: MONAI v0.3 DiceLoss(include_background=False, to_onehot_y=True,
    softmax=True) as configured at capstone/models/losses.py:71-85 —
    per-(sample,class) 1 - (2*I + s)/(U + s), s = 1e-5, then mean.
  - Focal: MONAI FocalLoss(gamma=2) against a one-hot target
    (capstone/models/losses.py:105-124) — per-(sample,class) voxel mean of
    -(1-p)^gamma * t * log p, then mean.

Everything is float64 so the JAX trajectory can be pinned to ~1e-8.
"""

import torch
import torch.nn.functional as F


def dice_loss_torch(logits: torch.Tensor, labels: torch.Tensor,
                    smooth: float = 1e-5) -> torch.Tensor:
    """logits (N, C, *spatial), labels (N, *spatial) int -> scalar."""
    n_classes = logits.shape[1]
    probs = torch.softmax(logits, dim=1)
    target = F.one_hot(labels.long(), n_classes)  # (N, *spatial, C)
    target = torch.movedim(target, -1, 1).to(logits.dtype)
    axes = tuple(range(2, logits.ndim))
    intersection = (target * probs).sum(dim=axes)  # (N, C)
    denominator = target.sum(dim=axes) + probs.sum(dim=axes)
    f = 1.0 - (2.0 * intersection + smooth) / (denominator + smooth)
    return f[:, 1:].mean()  # include_background=False


def focal_loss_torch(logits: torch.Tensor, labels: torch.Tensor,
                     gamma: float = 2.0) -> torch.Tensor:
    """logits (N, C, *spatial), labels (N, *spatial) int -> scalar."""
    n_classes = logits.shape[1]
    logp = torch.log_softmax(logits, dim=1)
    target = F.one_hot(labels.long(), n_classes)
    target = torch.movedim(target, -1, 1).to(logits.dtype)
    per_voxel = -((1.0 - logp.exp()) ** gamma) * target * logp  # (N, C, *sp)
    axes = tuple(range(2, logits.ndim))
    return per_voxel.mean(dim=axes).mean()  # per-(sample,class) voxel mean


LOSSES_TORCH = {"Dice": dice_loss_torch, "Focal": focal_loss_torch}


def loss_values_torch(logits, labels, loss_names):
    return {name: LOSSES_TORCH[name](logits, labels) for name in loss_names}


def train_step_torch(model, optimizer, images, labels, loss_names):
    """One reference training step: summed multi-loss -> backward -> Adam.

    images (N, C, *spatial), labels (N, *spatial). Returns the per-loss dict
    (detached floats).
    """
    optimizer.zero_grad()
    logits = model(images)
    values = loss_values_torch(logits, labels, loss_names)
    total = sum(values.values())
    total.backward()
    optimizer.step()
    return {k: float(v.detach()) for k, v in values.items()}


def mixup_train_step_torch(model, optimizer, images, labels, index, lam,
                           loss_names):
    """One mixup training step with a FIXED partner index and lambda
    (mixup_trainer.py:52-92): forward on the mixed images once, per-loss
    values lambda-combined across the two target sets, summed, Adam step."""
    optimizer.zero_grad()
    mixed = lam * images + (1.0 - lam) * images[index]
    logits = model(mixed)
    values_a = loss_values_torch(logits, labels, loss_names)
    values_b = loss_values_torch(logits, labels[index], loss_names)
    values = {
        k: lam * values_a[k] + (1.0 - lam) * values_b[k] for k in values_a
    }
    total = sum(values.values())
    total.backward()
    optimizer.step()
    return {k: float(v.detach()) for k, v in values.items()}
