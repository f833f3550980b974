"""Training CLIs: base 2D, mixup 2D, and volumetric 3D runs.

Argparse surface mirrors the reference trainers
(capstone/training/base_trainer.py:150-209 + 249-284,
 capstone/training/mixup_trainer.py:155-190,
 capstone/volumetric/base_trainer.py:134-182):
  --batch_size --transform_degree --filters --use_res_units --downsample
  --lr --loss_fx --exclude_missing --use_full_data --use_wandb
  --experiment_name --max_epochs
plus framework-native flags: --mixup, --bf16, --data_dir, --checkpoint_dir.

Usage:
    python -m ctseg_tpu.training.cli train        [...]   # BaseUNet2D parity
    python -m ctseg_tpu.training.cli train_mixup  [...]   # MixupUNet2D parity
    python -m ctseg_tpu.training.cli train_3d     [...]   # BaseUNet3D parity
"""

from argparse import ArgumentParser
from pathlib import Path

import jax

from ctseg_tpu.constants import EXPERIMENT_SEED
from ctseg_tpu.data.datasets import PackedDataset2D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.parallel import make_mesh
from ctseg_tpu.paths import DEFAULT_DATA_STORAGE
from ctseg_tpu.training.logging import MetricLogger
from ctseg_tpu.training.trainer import TrainConfig, Trainer


def _add_common_args(parser: ArgumentParser) -> None:
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument(
        "--transform_degree",
        type=int,
        default=0,
        help="Augmentation pipeline degree (see transforms/pipelines.py).",
    )
    parser.add_argument(
        # the reference pins 5 levels (models/__init__.py:3); strides derive
        # from the filter count here, so any depth >= 2 is a valid UNet
        "--filters", nargs="+", type=int, default=[64, 128, 256, 512, 1024]
    )
    parser.add_argument("--use_res_units", action="store_true", default=False)
    parser.add_argument("--downsample", action="store_true", default=False)
    parser.add_argument(
        "--input_size",
        type=int,
        default=None,
        help="2D transform output size (default: the reference's 512-scan "
        "crop geometry). Set to the slice size for non-PDDCA/synthetic data.",
    )
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument(
        "--loss_fx", nargs="+", type=str, default=["Focal", "Dice"]
    )
    parser.add_argument("--exclude_missing", action="store_true", default=False)
    parser.add_argument("--use_full_data", action="store_true", default=False)
    # None = "not given": fresh runs default to 200 (the reference's
    # trainer default); on --resume the checkpoint's total is kept unless
    # the flag is passed explicitly.
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=EXPERIMENT_SEED)
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--use_wandb", action="store_true", default=False)
    parser.add_argument("--experiment_name", type=str, default="UNet 2D")
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument(
        "--spatial_devices",
        type=int,
        default=1,
        help="train_3d: shard volume depth over this many devices "
        "(('data','space') mesh; n_devices must be a multiple). 1 = pure DP.",
    )
    parser.add_argument(
        "--resize_shape",
        nargs=3,
        type=int,
        default=None,
        help="train_3d: (H, W, D) volume grid (default: the reference's "
        "256 256 96, volumetric/transforms.py:19).",
    )
    parser.add_argument(
        "--volumetric_mode",
        type=str,
        default="resize",
        choices=["resize", "patch"],
        help="train_3d: 'resize' = the reference's whole-volume parity mode "
        "(nearest-resize to --resize_shape); 'patch' = native-resolution "
        "random-patch training (soft-tissue windowing + flips, "
        "PatchPipeline3D) — the north-star configuration.",
    )
    parser.add_argument(
        "--patch_size",
        nargs=3,
        type=int,
        default=None,
        help="train_3d patch mode: (H, W, D) patch (default 128 128 48).",
    )
    parser.add_argument(
        "--steps_per_epoch",
        type=int,
        default=None,
        help="train_3d patch mode: random-patch batches per epoch "
        "(default 100; on --resume the checkpoint's schedule wins).",
    )
    parser.add_argument(
        "--preset",
        type=str,
        default=None,
        choices=["model_l", "model_m", "model_3d"],
        help="Published configuration from the reference report (Table 1); "
        "overrides the individual model flags.",
    )
    parser.add_argument("--profile", action="store_true", default=False)
    parser.add_argument(
        "--resume",
        type=str,
        default=None,
        help="Checkpoint directory to resume training from (params, opt "
        "state, plateau state, and step all restore).",
    )


def _config_from_args(args, mixup: bool) -> TrainConfig:
    if args.preset:
        from ctseg_tpu.models.presets import PRESETS
        import dataclasses

        if PRESETS[args.preset].spatial_dims != 2:
            raise SystemExit(
                f"--preset {args.preset} is a 3D configuration; use the "
                "train_3d subcommand for it"
            )
        return dataclasses.replace(
            PRESETS[args.preset],
            epochs=args.max_epochs or 200,
            seed=args.seed,
            compute_dtype="bfloat16" if args.bf16 else "float32",
        )
    # use_res_units: 2 subunits for the base trainer, 1 for mixup ("works
    # better for mixup", reference mixup_trainer.py:26-42).
    num_res_units = (1 if mixup else 2) if args.use_res_units else 0
    size_kw = (
        {"input_size": args.input_size}
        if getattr(args, "input_size", None)
        else {}
    )
    return TrainConfig(
        **size_kw,
        filters=tuple(args.filters),
        num_res_units=num_res_units,
        downsample=args.downsample,
        transform_degree=args.transform_degree,
        lr=args.lr,
        batch_size=args.batch_size,
        loss_fx=tuple(args.loss_fx),
        exclude_missing=args.exclude_missing,
        mixup=mixup,
        epochs=args.max_epochs or 200,
        seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )


def _fit_batch(requested: int, n_items, divisor: int = 1) -> int:
    """Largest usable batch: <= dataset size (when bounded) and divisible by
    `divisor` (a mesh's data-axis size; batches shard over it). Shared by
    the 2D and 3D CLIs. n_items=None means unbounded — patch pipelines
    sample with replacement, so only divisibility applies."""
    b = requested if n_items is None else min(requested, n_items)
    if divisor > 1:
        if n_items is not None:
            assert n_items >= divisor, "dataset smaller than the device mesh"
        b = max((b // divisor) * divisor, divisor)
    return b


def fit_and_finalize(
    trainer, state, *, logger, checkpoint_dir, profile_ctx=None, **fit_kwargs
):
    """Trainer.fit plus the run epilogue every CLI shares: catch Preempted
    (report how to resume, close the logger, return None — callers must
    skip their publish/test tails), and save the final state of a COMPLETED
    run to `checkpoint_dir` (periodic every-N saves never fire for short
    runs; evaluate/predict/serve all take this directory directly)."""
    import contextlib

    from ctseg_tpu.training.trainer import Preempted

    try:
        with profile_ctx or contextlib.nullcontext():
            state = trainer.fit(
                state,
                logger=logger,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=25 if checkpoint_dir else 0,
                **fit_kwargs,
            )
    except Preempted as p:
        # Cut short by the scheduler: the resumable checkpoint is already on
        # disk (fit saved it). Do NOT publish a partial final model or start
        # a test evaluation inside the termination grace period.
        if checkpoint_dir:
            print(f"{p} — resume with --resume {checkpoint_dir}")
        else:
            print(
                f"{p} — NO checkpoint was saved (run had no "
                "--checkpoint_dir); progress is lost"
            )
        logger.close()
        return None
    if checkpoint_dir:
        trainer.save(checkpoint_dir, state)
    return state


def run_2d(args, mixup: bool) -> None:
    config = _config_from_args(args, mixup=mixup)
    data_dir = Path(args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_2d"))
    train = PackedDataset2D.load(data_dir / "train_packed.npz")
    valid = PackedDataset2D.load(data_dir / "valid_packed.npz")
    if args.use_full_data:
        train = PackedDataset2D.concatenate(train, valid)

    mesh = make_mesh(args.n_devices) if len(jax.devices()) > 1 else None
    if args.resume:
        trainer, state = Trainer.restore(args.resume, mesh=mesh)
        config = trainer.config
    else:
        trainer = Trainer(config, mesh=mesh)
        state = trainer.init_state()

    logger = MetricLogger(
        log_dir=args.checkpoint_dir or "logs",
        use_wandb=args.use_wandb,
        experiment_name=args.experiment_name,
        config=config.as_dict(),
    )
    divisor = mesh.size if mesh is not None else 1
    train_pipe = DevicePipeline2D(
        train, _fit_batch(config.batch_size, len(train), divisor)
    )
    val_pipe = (
        None
        if args.use_full_data
        else DevicePipeline2D(
            valid, _fit_batch(config.batch_size, len(valid), divisor)
        )
    )
    callbacks = []
    if args.checkpoint_dir:
        from ctseg_tpu.training.callbacks import ExamplesLoggingCallback

        callbacks.append(
            ExamplesLoggingCallback(
                valid, Path(args.checkpoint_dir) / "examples"
            )
        )
    from ctseg_tpu.utils.profiling import trace

    profile_ctx = (
        trace(str(Path(args.checkpoint_dir or "logs") / "profile"))
        if args.profile
        else None
    )
    state = fit_and_finalize(
        trainer,
        state,
        logger=logger,
        checkpoint_dir=args.checkpoint_dir,
        profile_ctx=profile_ctx,
        train_pipeline=train_pipe,
        val_pipeline=val_pipe,
        epochs=args.max_epochs,  # None -> the config's total
        callbacks=callbacks,
    )
    if state is None:  # preempted; logger already closed
        return

    if args.use_full_data:
        # Final model: save + test (reference base_trainer.py:244-246). The
        # artifact name follows the TRAINED config, not the subcommand: a
        # --preset can flip mixup relative to the entry point, and resume
        # takes its config from the checkpoint.
        name = "model_mixup" if config.mixup else "model_large"
        out = Path(DEFAULT_DATA_STORAGE) / name
        trainer.save(out, state)
        test = PackedDataset2D.load(data_dir / "test_packed.npz")
        test_bs = _fit_batch(config.batch_size, len(test), divisor)
        metrics = trainer.eval_epoch(
            state.params, DevicePipeline2D(test, test_bs), "test", logger,
            step=int(state.step),
        )
        print({k: round(v, 4) for k, v in metrics.items()})
    logger.close()


def run_3d(args) -> None:
    from ctseg_tpu.volumetric.trainer3d import run_3d_training

    run_3d_training(args)


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = ArgumentParser(description="ctseg_tpu training")
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("train", "train_mixup", "train_3d"):
        p = sub.add_parser(name)
        _add_common_args(p)
    args = parser.parse_args()

    if args.command == "train":
        run_2d(args, mixup=False)
    elif args.command == "train_mixup":
        run_2d(args, mixup=True)
    elif args.command == "train_3d":
        run_3d(args)


if __name__ == "__main__":
    main()
