"""3D volumetric training (reference capstone/volumetric/ equivalent).

The reference needed a full twin stack for 3D (datasets, transforms, losses,
metrics, trainer — capstone/volumetric/*); here the N-D model, losses, and
metrics are shared with 2D, so 3D is just a Trainer with volumetric
transforms and a 3D pipeline.

Reference parity mode ("resize"): whole volumes nearest-resized to
256x256x96, single input channel of raw HU values (the reference's
"windowed_degree_0" applies no windowing, volumetric/predefined.py:4-7),
CrossEntropy loss, batch 1, plain Adam with no LR schedule
(volumetric/base_trainer.py:113-114 — we keep the plateau machinery but a
patience larger than the epoch count is equivalent).

North-star mode ("patch"): native-resolution random patches + soft-tissue
windowing + flips, trainable with Focal+Dice.
"""

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.data.datasets import PackedDataset3D
from ctseg_tpu.parallel import make_mesh
from ctseg_tpu.paths import DEFAULT_DATA_STORAGE
from ctseg_tpu.training.logging import MetricLogger
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.transforms.windowing import soft_tissue_window
from ctseg_tpu.volumetric.pipeline3d import RESIZE_SHAPE, DevicePipeline3D


def _identity_transform(key, image, label):
    """Volumes arrive pre-resized; just add the channel axis (parity mode:
    no windowing, raw HU, reference volumetric/predefined.py:4-7)."""
    return image[..., None], label


def _windowed_patch_transform(key, image, label):
    """Patch mode: soft-tissue windowing + random flips along H/W."""
    k1, k2 = jax.random.split(key)
    img = soft_tissue_window(image)
    do_h = jax.random.bernoulli(k1, 0.5)
    do_w = jax.random.bernoulli(k2, 0.5)
    img = jnp.where(do_h, jnp.flip(img, 0), img)
    lab = jnp.where(do_h, jnp.flip(label, 0), label)
    img = jnp.where(do_w, jnp.flip(img, 1), img)
    lab = jnp.where(do_w, jnp.flip(lab, 1), lab)
    return img, lab


def make_trainer_3d(
    config: Optional[TrainConfig] = None,
    mode: str = "resize",
    patch_size: Optional[Tuple[int, int, int]] = None,
    mesh=None,
) -> Trainer:
    """Build a 3D trainer. `config` defaults to reference-parity settings.

    `patch_size` (patch mode) sets the training grid whether or not a
    config is supplied — with a config it overrides `config.input_shape`,
    so callers don't have to duplicate it into the config by hand.
    """
    import dataclasses

    if config is not None and mode == "patch" and patch_size is not None:
        if tuple(config.input_shape or ()) != tuple(patch_size):
            config = dataclasses.replace(config, input_shape=tuple(patch_size))
    if patch_size is None:
        patch_size = (128, 128, 48)
    if config is None:
        config = TrainConfig(
            filters=(64, 128, 256, 512, 1024),
            num_res_units=2,  # hardcoded in the reference (3D)
            transform_degree=0,
            lr=1e-3,
            batch_size=1,
            loss_fx=("CrossEntropy",),
            spatial_dims=3,
            input_shape=RESIZE_SHAPE if mode == "resize" else patch_size,
            in_channels=1,
            # the reference 3D trainer has no LR schedule; an un-triggerable
            # patience preserves that behavior through the shared machinery
            plateau_patience=10_000,
        )
    if config.volumetric_mode != mode:
        config = dataclasses.replace(config, volumetric_mode=mode)
    transform = (
        _identity_transform if mode == "resize" else _windowed_patch_transform
    )
    return Trainer(
        config, mesh=mesh, train_transform=transform, test_transform=transform
    )


def run_3d_training(args) -> None:
    """CLI entry (python -m ctseg_tpu.training.cli train_3d)."""
    mode = getattr(args, "volumetric_mode", None) or "resize"
    patch_size = tuple(getattr(args, "patch_size", None) or (128, 128, 48))
    resize_shape = tuple(
        getattr(args, "resize_shape", None) or RESIZE_SHAPE
    )
    if getattr(args, "preset", None):
        # Published configuration (reference volumetric/base_trainer.py
        # defaults via models/presets.py); overrides the individual flags
        # exactly like the 2D CLI's preset path.
        import dataclasses

        from ctseg_tpu.models.presets import PRESETS

        preset = PRESETS[args.preset]
        if preset.spatial_dims != 3:
            raise SystemExit(
                f"--preset {args.preset} is a 2D configuration; use the "
                "train/train_mixup subcommands for it"
            )
        config = dataclasses.replace(
            preset,
            epochs=args.max_epochs or preset.epochs,
            seed=args.seed,
            compute_dtype="bfloat16" if args.bf16 else "float32",
        )
        mode = config.volumetric_mode or "resize"
        patch_size = tuple(config.input_shape)
    else:
        config = TrainConfig(
            filters=tuple(args.filters),
            num_res_units=2,
            transform_degree=0,
            lr=args.lr,
            batch_size=args.batch_size,
            loss_fx=tuple(args.loss_fx),
            exclude_missing=args.exclude_missing,
            epochs=args.max_epochs or 200,
            seed=args.seed,
            spatial_dims=3,
            input_shape=patch_size if mode == "patch" else resize_shape,
            in_channels=1,
            plateau_patience=10_000,
            compute_dtype="bfloat16" if args.bf16 else "float32",
            steps_per_epoch=(
                (getattr(args, "steps_per_epoch", None) or 100)
                if mode == "patch"
                else None
            ),
        )
    # Data loads after flag validation so a bad --preset fails fast.
    data_dir = Path(args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_3d"))
    train = PackedDataset3D.load(data_dir / "train_packed.npz")
    valid = PackedDataset3D.load(data_dir / "valid_packed.npz")
    n_space = getattr(args, "spatial_devices", 1)
    if n_space > 1:
        from ctseg_tpu.parallel import make_spatial_mesh

        n_dev = args.n_devices or len(jax.devices())
        assert n_dev % n_space == 0, (
            f"--n_devices {n_dev} not divisible by --spatial_devices {n_space}"
        )
        mesh = make_spatial_mesh(n_dev // n_space, n_space)
    else:
        mesh = make_mesh(args.n_devices) if len(jax.devices()) > 1 else None
    if getattr(args, "resume", None):
        # Same resume contract as the 2D CLI (params/opt/plateau/step all
        # restore; Trainer.__init__ rebuilds the volumetric transforms from
        # the checkpoint's spatial_dims/volumetric_mode hparams).
        trainer, state = Trainer.restore(args.resume, mesh=mesh)
        config = trainer.config
        mode = config.volumetric_mode or "resize"
    else:
        trainer = make_trainer_3d(
            config, mode=mode, patch_size=patch_size, mesh=mesh
        )
        state = trainer.init_state()
    # make_trainer_3d stamps volumetric_mode into ITS config copy; log/use
    # that one so the experiment record matches the checkpoint hparams.
    config = trainer.config
    input_shape = tuple(config.input_shape)  # patch or resize grid

    logger = MetricLogger(
        log_dir=args.checkpoint_dir or "logs",
        use_wandb=args.use_wandb,
        experiment_name=args.experiment_name,
        config=config.as_dict(),
    )
    # Usable batch sizes: divisible by the mesh's data axis (batches shard
    # over 'data' only; 'space' shards volume depth). Resize mode is
    # additionally bounded by the split size; patch mode samples patches
    # with replacement, so only divisibility applies.
    n_data = mesh.shape["data"] if mesh is not None else 1
    from ctseg_tpu.training.cli import _fit_batch, fit_and_finalize

    if mode == "patch":
        from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D

        bs = _fit_batch(config.batch_size, None, n_data)
        # The epoch schedule lives in the checkpoint (resume derives the
        # start epoch from state.step // steps_per_epoch); a conflicting
        # --steps_per_epoch on resume would corrupt that derivation.
        requested = getattr(args, "steps_per_epoch", None)
        steps = config.steps_per_epoch or requested or 100
        if requested and config.steps_per_epoch and requested != config.steps_per_epoch:
            import warnings

            warnings.warn(
                f"--steps_per_epoch {requested} ignored: the checkpoint's "
                f"schedule is {config.steps_per_epoch} steps/epoch and the "
                "resume epoch is derived from it"
            )
        train_pipe = PatchPipeline3D(
            train, bs, patch_size=input_shape, steps_per_epoch=steps
        )
        val_pipe = PatchPipeline3D(
            valid, bs, patch_size=input_shape, steps_per_epoch=steps
        )
    else:
        train_pipe = DevicePipeline3D(
            train,
            _fit_batch(config.batch_size, len(train), n_data),
            shape=input_shape,
        )
        val_pipe = DevicePipeline3D(
            valid,
            _fit_batch(config.batch_size, len(valid), n_data),
            shape=input_shape,
        )

    state = fit_and_finalize(
        trainer,
        state,
        logger=logger,
        checkpoint_dir=args.checkpoint_dir,
        train_pipeline=train_pipe,
        val_pipeline=val_pipe,
        epochs=args.max_epochs,  # None -> the config's total
    )
    if state is None:  # preempted; logger already closed
        return
    logger.close()
