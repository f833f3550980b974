"""Reference-stack benchmark: PyTorch + MONAI Model L training throughput.

This is the runnable competitor baseline for bench.py line 1. It times the
REFERENCE's exact flagship training configuration —
`/root/reference/capstone/training/base_trainer.py:64-79` (MONAI 2D UNet,
in_channels=3, out_channels=10, filters 64..1024, strides (2,2,2,2),
num_res_units=2), batch 128 (`base_trainer.py:155`), Focal+Dice
(`losses.py:163-165` wrappers), Adam lr=1e-3 (`base_trainer.py:139`),
degree-2 Albumentations train transforms
(`transforms/predefined.py:36-52`: 3-channel windowing, RandomCrop 256,
RandomRotate90, HorizontalFlip, Normalize) running in DataLoader workers,
AMP autocast + GradScaler on CUDA — with the SAME step-timing protocol as
bench.py (3 warmup steps, 20 timed steps, device sync before/after, wall
clock over the live dataloader loop, per-step Dice logging included).

Run it on a CUDA host with the reference's stack installed to replace
bench.py's `A100_MONAI_ESTIMATE` with a measured number:

    python perf/bench_torch_monai.py                     # full Model L
    python perf/bench_torch_monai.py --device cpu --batch 4 \
        --raw 96 --crop 64 --filters 8 16 32 64 128 --steps 2  # smoke

Degradation rules (so the protocol stays runnable and in-suite here, where
monai/albumentations are not installed — this container has torch-cpu
only):
  - `monai` importable   -> monai.networks.nets.UNet (the reference's own)
    else                 -> tests/torch_unet_oracle.MonaiUNetOracle, the
                            state_dict-compatible plain-torch replica this
                            repo verifies against flax at f64
                            (tests/test_model_oracle.py)
  - `albumentations` importable -> the reference's literal degree-2 Compose
    else                 -> a numpy reimplementation of the same five ops
                            (identical math; windowing clip/shift per
                            transforms_2d.py:6 WINDOWING_CONFIG)
  - losses: plain-torch Focal(gamma=2, mean)/Dice(include_background=False,
    to_onehot_y, softmax, smooth 1e-5) matching the MONAI wrappers the
    reference builds (mirrors ctseg_tpu/losses/segmentation.py, which is
    differential-tested against the same published semantics).

`--dims 3` times bench.py line 2's volumetric configuration instead: the
reference's 3D model (capstone/volumetric/base_trainer.py:58-72 — MONAI
UNet dimensions=3, in_channels=1, num_res_units=2), CE+Dice, batch 128,
random native-resolution (128,128,16) patches windowed in the workers.

Output: ONE JSON line, same shape as bench.py's —
  {"metric": "torch_monai_model_l_train_throughput", "value": patches/sec,
   "unit", "ms_per_step", "device", "amp", "backend": {...}}
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

WINDOWING_CONFIG = {"brain": (80, 40), "soft_tissue": (350, 20), "bone": (2800, 600)}
_WINDOW_MEAN = (0.107, 0.135, 0.085)
_WINDOW_STD = (0.271, 0.267, 0.152)


# ---------------------------------------------------------------- transforms
def _apply_window(image: np.ndarray, width: int, level: int, shift: bool) -> np.ndarray:
    """Reference windowing math (capstone/transforms/transforms_2d.py
    apply_window, same clip/shift as ctseg_tpu/transforms/windowing.py)."""
    low, high = level - width / 2.0, level + width / 2.0
    out = np.clip(image, low, high)
    if shift:
        out = (out - low) / width
    return out


class NumpyDegree2:
    """Albumentations-free degree-2 train transform: 3-window channels,
    RandomCrop(crop), RandomRotate90, HorizontalFlip, Normalize — the same
    op sequence as transforms/predefined.py:36-52 `windowed_degree_2`."""

    def __init__(self, crop: int, rng: np.random.Generator):
        self.crop = crop
        self.rng = rng

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        h, w = image.shape
        windows = np.stack(
            [_apply_window(image, *WINDOWING_CONFIG[k], shift=True)
             for k in ("brain", "soft_tissue", "bone")],
            axis=-1,
        )  # (H, W, 3)
        y = int(self.rng.integers(0, h - self.crop + 1))
        x = int(self.rng.integers(0, w - self.crop + 1))
        windows = windows[y:y + self.crop, x:x + self.crop]
        mask = mask[y:y + self.crop, x:x + self.crop]
        k = int(self.rng.integers(0, 4))
        if k:
            windows = np.rot90(windows, k, axes=(0, 1))
            mask = np.rot90(mask, k, axes=(0, 1))
        if self.rng.random() < 0.5:
            windows = windows[:, ::-1]
            mask = mask[:, ::-1]
        windows = (windows - _WINDOW_MEAN) / _WINDOW_STD
        img = torch.from_numpy(
            np.ascontiguousarray(windows.transpose(2, 0, 1), dtype=np.float32)
        )
        return img, torch.from_numpy(np.ascontiguousarray(mask, dtype=np.int64))


def make_albumentations_degree2(crop: int):
    """The reference's literal pipeline when albumentations is available."""
    import albumentations as A  # noqa: F401
    from albumentations.pytorch.transforms import ToTensorV2

    class WindowedChannels(A.ImageOnlyTransform):
        def __init__(self):
            super().__init__(True, 1.0)

        def apply(self, image, **params):
            return np.stack(
                [_apply_window(image, *WINDOWING_CONFIG[k], shift=True)
                 for k in ("brain", "soft_tissue", "bone")],
                axis=-1,
            )

    pipe = A.Compose([
        WindowedChannels(),
        A.RandomCrop(crop, crop),
        A.RandomRotate90(),
        A.HorizontalFlip(),
        A.Normalize(mean=_WINDOW_MEAN, std=_WINDOW_STD, max_pixel_value=1.0),
        ToTensorV2(),
    ])

    def call(image, mask):
        out = pipe(image=image, mask=mask)
        return out["image"].float(), out["mask"].long()

    return call


# ------------------------------------------------------------------ dataset
class SyntheticSlices(torch.utils.data.Dataset):
    """Raw-HU synthetic slices, transformed per-item in DataLoader workers —
    where the reference stack does its augmentation work."""

    def __init__(self, n: int, raw: int, crop: int, use_albumentations: bool):
        rng = np.random.default_rng(0)
        self.images = rng.normal(40, 300, size=(n, raw, raw)).astype(np.float32)
        self.labels = rng.integers(0, 10, size=(n, raw, raw)).astype(np.uint8)
        self.indicators = rng.integers(0, 2, size=(n, 9)).astype(np.float32)
        if use_albumentations:
            self.transform = make_albumentations_degree2(crop)
        else:
            self.transform = NumpyDegree2(crop, np.random.default_rng(1))

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img, mask = self.transform(self.images[i], self.labels[i])
        return img, mask, torch.from_numpy(self.indicators[i])


class SyntheticPatches3D(torch.utils.data.Dataset):
    """Raw-HU synthetic volumes; each item is a random native-resolution
    3D patch, soft-tissue windowed in the worker — the torch-side analogue
    of bench.py line 2's on-device PatchPipeline3D + windowed patch
    transform (reference 3D model config:
    capstone/volumetric/base_trainer.py:58-72, in_channels=1)."""

    def __init__(self, n_vols: int, vol_shape, patch):
        rng = np.random.default_rng(0)
        self.volumes = [
            rng.integers(-1024, 2000, size=vol_shape).astype(np.int16)
            for _ in range(n_vols)
        ]
        self.labels = [
            rng.integers(0, 10, size=vol_shape).astype(np.uint8)
            for _ in range(n_vols)
        ]
        self.patch = patch  # (H, W, D); volumes are (D, H, W)
        self.rng = np.random.default_rng(1)
        self.n_items = 4096  # virtual length: patches per epoch

    def __len__(self):
        return self.n_items

    def __getitem__(self, _):
        i = int(self.rng.integers(0, len(self.volumes)))
        vol, lab = self.volumes[i], self.labels[i]
        ph, pw, pd = self.patch
        d0 = int(self.rng.integers(0, vol.shape[0] - pd + 1))
        y0 = int(self.rng.integers(0, vol.shape[1] - ph + 1))
        x0 = int(self.rng.integers(0, vol.shape[2] - pw + 1))
        img = vol[d0:d0 + pd, y0:y0 + ph, x0:x0 + pw].astype(np.float32)
        img = _apply_window(img, *WINDOWING_CONFIG["soft_tissue"], shift=True)
        msk = lab[d0:d0 + pd, y0:y0 + ph, x0:x0 + pw].astype(np.int64)
        # (1, H, W, D) like the repo's channel-last-before-conv layout;
        # torch conv3d treats the three trailing axes symmetrically.
        img = np.ascontiguousarray(img.transpose(1, 2, 0)[None])
        msk = np.ascontiguousarray(msk.transpose(1, 2, 0))
        return torch.from_numpy(img), torch.from_numpy(msk), torch.ones(9)


# ------------------------------------------------------------------- losses
def focal_loss(logits, labels, gamma: float = 2.0):
    """MONAI FocalLoss(gamma=2, mean) semantics on a one-hot target: mean
    over (N, V, C) of -(1-p)^g * t * log p (each voxel hits one class)."""
    n_classes = logits.shape[1]
    logp = torch.log_softmax(logits, dim=1)
    logp_y = torch.gather(logp, 1, labels.unsqueeze(1)).squeeze(1)
    per_voxel = -((1.0 - torch.exp(logp_y)) ** gamma) * logp_y
    return per_voxel.sum() / (per_voxel.numel() * n_classes)


def dice_loss(logits, labels, smooth: float = 1e-5):
    """MONAI DiceLoss(include_background=False, to_onehot_y=True,
    softmax=True, mean) semantics (2D or 3D)."""
    n_classes = logits.shape[1]
    probs = torch.softmax(logits, dim=1)
    target = torch.nn.functional.one_hot(labels, n_classes)
    perm = (0, labels.ndim) + tuple(range(1, labels.ndim))
    target = target.permute(*perm).to(probs.dtype)
    dims = tuple(range(2, logits.ndim))
    intersection = (target * probs).sum(dim=dims)[:, 1:]
    target_o = target.sum(dim=dims)[:, 1:]
    pred_o = probs.sum(dim=dims)[:, 1:]
    f = 1.0 - (2.0 * intersection + smooth) / (target_o + pred_o + smooth)
    return f.mean()


def dice_metric(pred_labels, labels, n_classes: int = 10):
    """Per-step mean Dice over present foreground classes (the reference
    logs this every step via DiceMetricWrapper)."""
    scores = []
    for c in range(1, n_classes):
        p = pred_labels == c
        t = labels == c
        denom = p.sum() + t.sum()
        if denom > 0:
            scores.append(2.0 * (p & t).sum().float() / denom.float())
    return torch.stack(scores).mean() if scores else torch.zeros(())


# -------------------------------------------------------------------- model
def build_model(filters, num_res_units: int = 2, dims: int = 2,
                in_channels: int = 3):
    try:
        from monai.networks.nets import UNet

        net = UNet(
            dimensions=dims, in_channels=in_channels, out_channels=10,
            channels=list(filters), strides=[2, 2, 2, 2],
            num_res_units=num_res_units,
        )
        return net, "monai"
    except ImportError:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
        from torch_unet_oracle import MonaiUNetOracle

        net = MonaiUNetOracle(
            dims=dims, in_channels=in_channels, out_channels=10,
            channels=tuple(filters), strides=(2, 2, 2, 2),
            num_res_units=num_res_units,
        )
        return net, "torch_unet_oracle (state_dict-compatible MONAI replica)"


# ---------------------------------------------------------------------- run
def run(args) -> dict:
    torch.manual_seed(12342)  # reference SEED, base_trainer.py:19
    device = torch.device(args.device)
    use_cuda = device.type == "cuda"
    use_alb = False
    if not args.no_albumentations:
        try:
            import albumentations  # noqa: F401

            use_alb = True
        except ImportError:
            pass

    model, backend = build_model(
        args.filters, dims=args.dims, in_channels=3 if args.dims == 2 else 1
    )
    model = model.to(device).train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    scaler = torch.amp.GradScaler("cuda", enabled=use_cuda)

    if args.dims == 2:
        ds = SyntheticSlices(
            n=max(args.batch * 2, 8), raw=args.raw, crop=args.crop,
            use_albumentations=use_alb,
        )
    else:
        patch = tuple(args.patch)
        vol_shape = (
            max(27, patch[2] + 2), max(args.raw, patch[0]),
            max(args.raw, patch[1]),
        )
        ds = SyntheticPatches3D(n_vols=8, vol_shape=vol_shape, patch=patch)
    loader = torch.utils.data.DataLoader(
        ds, batch_size=args.batch, shuffle=True, drop_last=True,
        num_workers=args.workers, pin_memory=use_cuda,
        persistent_workers=args.workers > 0,
    )

    def step(batch):
        images, masks, indicators = (t.to(device, non_blocking=True) for t in batch)
        opt.zero_grad(set_to_none=True)
        with torch.autocast(device.type, enabled=use_cuda):
            logits = model(images)
            if args.dims == 2:  # Focal+Dice: the flagship 2D recipe
                loss = focal_loss(logits, masks) + dice_loss(logits, masks)
            else:  # CE+Dice: bench.py line 2's 3D recipe
                loss = torch.nn.functional.cross_entropy(
                    logits, masks
                ) + dice_loss(logits, masks)
        scaler.scale(loss).backward()
        scaler.step(opt)
        scaler.update()
        with torch.no_grad():  # the reference logs Dice every step
            dice = dice_metric(logits.detach().argmax(dim=1), masks)
        return loss.detach(), dice

    it = iter(loader)

    def next_batch():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(loader)
            return next(it)

    for _ in range(args.warmup):
        loss, _ = step(next_batch())
    if use_cuda:
        torch.cuda.synchronize()
    float(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss, dice = step(next_batch())
    if use_cuda:
        torch.cuda.synchronize()
    float(loss)
    step_s = (time.perf_counter() - t0) / args.steps

    return {
        "metric": (
            "torch_monai_model_l_train_throughput" if args.dims == 2
            else "torch_monai_unet3d_patch_train_throughput"
        ),
        "value": round(args.batch / step_s, 2),
        "unit": "patches/sec",
        "ms_per_step": round(step_s * 1000, 2),
        "device": torch.cuda.get_device_name(device) if use_cuda else "cpu",
        "amp": use_cuda,
        "batch": args.batch,
        "dims": args.dims,
        "crop": args.crop if args.dims == 2 else list(args.patch),
        "filters": list(args.filters),
        "backend": {
            "model": backend,
            "transforms": (
                ("albumentations" if use_alb else "numpy degree-2")
                if args.dims == 2 else "random 3D patch + soft-tissue window"
            ),
            "torch": torch.__version__,
            "workers": args.workers,
        },
        "final_loss": round(float(loss), 4),
        "final_dice": round(float(dice), 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--device", default="cuda" if torch.cuda.is_available() else "cpu")
    p.add_argument("--batch", type=int, default=128)  # base_trainer.py:155
    p.add_argument("--raw", type=int, default=280)  # post-crop slice size
    p.add_argument("--crop", type=int, default=256)  # RandomCrop(256, 256)
    p.add_argument("--filters", nargs=5, type=int,
                   default=[64, 128, 256, 512, 1024])
    p.add_argument("--steps", type=int, default=20)  # == bench.py TIMED_STEPS
    p.add_argument("--warmup", type=int, default=3)  # == bench.py WARMUP_STEPS
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--dims", type=int, choices=(2, 3), default=2,
                   help="2 = flagship Model L slices; 3 = the bench.py "
                        "line-2 volumetric patch config (CE+Dice, "
                        "in_channels=1)")
    p.add_argument("--patch", nargs=3, type=int, default=[128, 128, 16],
                   help="3D patch (H, W, D) when --dims 3")
    p.add_argument("--no_albumentations", action="store_true",
                   help="force the numpy transform fallback")
    args = p.parse_args(argv)
    result = run(args)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
