"""Functional trainer: jitted train/eval steps, plateau LR, checkpoints.

Replaces the reference's PyTorch-Lightning stack (BaseUNet2D/MixupUNet2D,
capstone/training/base_trainer.py:22-148, mixup_trainer.py:22-128) with an
explicit state machine:

  TrainState = (step, params, opt_state, plateau)
  train_step: on-device transform -> [mixup] -> forward -> multi-loss ->
              grads -> Adam(lr from plateau state) -> metrics
  eval_step:  test transform -> forward -> per-structure Dice

Data parallelism is pjit-style: hand the Trainer a `jax.sharding.Mesh` and
batches are sharded over its 'data' axis with replicated params; XLA inserts
the gradient all-reduce over ICI (the reference's implicit ceiling was
Lightning-DDP; SURVEY.md §2).

Everything inside the step is jitted once per shape; the input pipeline keeps
shapes static (fixed batch, fixed crop size).
"""

import dataclasses
import time
import warnings
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ctseg_tpu.constants import EXPERIMENT_SEED, NUM_CLASSES, STRUCTURES
from ctseg_tpu.losses import MultiLoss
from ctseg_tpu.metrics import DiceMetric, dice_per_sample_class, masked_mean_batch
from ctseg_tpu.models import SegmentationModel
from ctseg_tpu.ops import squash_predictions
from ctseg_tpu.ops.edt import signed_distance_maps_from_labels
from ctseg_tpu.training import checkpoint as ckpt
from ctseg_tpu.training.logging import MetricLogger
from ctseg_tpu.training.optimizer import adam_init, adam_update
from ctseg_tpu.training.mixup import mixup_tensors, weighted_mixup
from ctseg_tpu.training.schedule import PlateauState, plateau_init, reduce_on_plateau
from ctseg_tpu.transforms.pipelines import (
    batched_transform,
    get_transform,
    transform_in_channels,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (reference argparse surface, base_trainer.py:150-209)."""

    filters: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    num_res_units: int = 0  # use_res_units: base->2, mixup->1
    downsample: bool = False
    transform_degree: int = 0
    lr: float = 1e-3
    batch_size: int = 128
    loss_fx: Tuple[str, ...] = ("Focal", "Dice")
    exclude_missing: bool = False
    mixup: bool = False
    mixup_alpha: float = 0.2
    epochs: int = 200
    seed: int = EXPERIMENT_SEED
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    plateau_threshold: float = 0.01
    # "bfloat16" for MXU-friendly training; "float64" for CPU differential
    # tests (params + compute + losses all f64; requires jax_enable_x64).
    compute_dtype: str = "float32"
    # Fuse stride-1 3x3 conv+IN+PReLU units into one Pallas kernel (TPU).
    # Checkpoint-compatible with the unfused path; infeasible shapes fall
    # back to XLA automatically.
    fused_conv: bool = False
    # Run every InstanceNorm+PReLU as the one-pass Pallas kernel
    # (ops/pallas/instance_norm.py): bf16 in/out, f32 stats, saved-stats
    # backward. Checkpoint-compatible (parameter-free); silently falls back
    # to the XLA chain off-TPU.
    fused_norm: bool = False
    # Decoder transposed convs as dense polyphase convs (checkpoint-
    # compatible; see models/layers.py::polyphase_conv_transpose).
    # OFF by default: measured slower than XLA's lowering on v5e.
    polyphase_up: bool = False
    # Strided shallow-Cin 3D convs (the stem) as one lane-full 2D conv over
    # the (D, Cin)-folded input (checkpoint-compatible; see
    # models/layers.py::ConvUnit.packed_depth). OFF by default: 1.7x
    # isolated but 0.986x on the compiled full 3D step (v5e,
    # perf/ab_stem_packed_step_v5e.json).
    packed_depth: bool = False
    # Packed-polyphase FORWARD on the top decoder transposed conv
    # (checkpoint-compatible; backward stays on the shallow_grad rules).
    # Site-measured fwd win at the 3D up0 site (9.4 vs 12.4 ms,
    # perf/transp3d_v5e.json) but 0.996x on the compiled full 3D step
    # (perf/ab_packed_up_step_v5e.json) — XLA's schedule already overlaps
    # the site. OFF by default per CLAUDE.md rule 3.
    packed_up_fwd: bool = False
    spatial_dims: int = 2
    input_size: int = 256  # post-transform spatial size (reference: 256)
    # Optional overrides for non-square/3D inputs; None derives them from
    # input_size/spatial_dims/transform_degree.
    input_shape: Any = None  # tuple of spatial dims
    in_channels: Any = None
    # 3D transform selection ("resize" parity / "patch" north star); makes
    # checkpoints self-describing so Trainer.restore rebuilds 3D trainers
    # with the right volumetric transforms.
    volumetric_mode: Any = None
    # Steps per epoch. Recorded in the checkpoint because resume derives the
    # start epoch from state.step // steps_per_epoch — an un-checkpointed
    # value would let a resume with a different flag (--use_full_data, a
    # different --steps_per_epoch) silently train the wrong number of
    # epochs. Patch-mode 3D sets it up front (sampled patches per epoch);
    # data-length modes start at None and fit() records the pipeline's
    # batch count at the first epoch.
    steps_per_epoch: Any = None

    def as_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        d = dict(d)
        for k in ("filters", "loss_fx", "input_shape"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    plateau: PlateauState


class Preempted(RuntimeError):
    """Raised by Trainer.fit after a SIGTERM-triggered save: training was cut
    short. Carries the last state so callers can still use it — but they must
    not run their 'training finished' tails (publishing the final model,
    launching test evaluation) during a termination grace period."""

    def __init__(self, state: "TrainState", epoch: int):
        super().__init__(f"training preempted by SIGTERM at epoch {epoch}")
        self.state = state
        self.epoch = epoch


class Trainer:
    def __init__(
        self,
        config: TrainConfig,
        mesh: Optional[jax.sharding.Mesh] = None,
        train_transform=None,
        test_transform=None,
    ):
        self.config = config
        self.mesh = mesh
        # Spatially-partitioned 3D training: a ('data', 'space') mesh shards
        # volume depth over 'space' (parallel/mesh.py::make_spatial_mesh);
        # the model pins per-level depth shardings and XLA inserts the conv
        # halo exchanges. 2D trainers ignore the space axis.
        self._spatial = (
            mesh is not None
            and "space" in mesh.axis_names
            and mesh.shape["space"] > 1
            and config.spatial_dims == 3
        )
        # "float64" exists for differential tests (e.g. the two-process
        # trainer-equivalence run, tests/test_distributed.py) where reduction
        # -order noise must sit far below any real bug; TPUs have no f64.
        dtype = {
            "bfloat16": jnp.bfloat16, "float64": jnp.float64
        }.get(config.compute_dtype, jnp.float32)
        self._compute_dtype = dtype
        # Losses/metrics run in f32 under bf16 compute (numerics rule), and
        # in f64 under f64 compute (full-precision differentials).
        self._metric_dtype = (
            jnp.float64 if config.compute_dtype == "float64" else jnp.float32
        )
        param_dtype = (
            jnp.float64 if config.compute_dtype == "float64" else jnp.float32
        )
        self.model = SegmentationModel(
            param_dtype=param_dtype,
            out_channels=NUM_CLASSES,
            channels=tuple(config.filters),
            # one stride-2 stage between consecutive filter levels, matching
            # MONAI's UNet contract for any depth (reference models/__init__.py:3
            # hardcodes 5 levels; --filters here may be shorter or longer)
            strides=(2,) * (len(config.filters) - 1),
            num_res_units=config.num_res_units,
            downsample=config.downsample,
            dtype=dtype,
            fused_conv_block=config.fused_conv,
            # The fused IN+PReLU kernel has no pjit partitioning rule yet:
            # under a mesh XLA would gather the batch around the pallas_call,
            # so fusion engages on single-chip trainers only (the kernel
            # itself is also TPU-gated, models/layers.py::PReLU).
            fused_norm_act=config.fused_norm and mesh is None,
            polyphase_up=config.polyphase_up,
            packed_up_fwd=config.packed_up_fwd,
            packed_depth=config.packed_depth,
            spatial_mesh=mesh if self._spatial else None,
        )
        self.loss = MultiLoss(
            list(config.loss_fx), exclude_missing=config.exclude_missing
        )
        self.needs_dist_maps = "Boundary" in config.loss_fx
        self.dice = DiceMetric()
        # Each side falls back independently: a 3D trainer given only a
        # train_transform must NOT silently evaluate through the 2D resize
        # pipeline below.
        if config.spatial_dims == 3:
            from ctseg_tpu.volumetric.trainer3d import (
                _identity_transform,
                _windowed_patch_transform,
            )

            vt = (
                _windowed_patch_transform
                if config.volumetric_mode == "patch"
                else _identity_transform
            )
            train_transform = train_transform or vt
            test_transform = test_transform or vt
        size = (config.input_size,) * 2
        self.train_transform = train_transform or get_transform(
            config.transform_degree, train=True, size=size
        )
        self.test_transform = test_transform or get_transform(
            config.transform_degree, train=False, size=size
        )
        # Optimizer: hand-rolled Adam (training/optimizer.py), torch-identical
        # update with the plateau LR as a plain scalar argument — optax's
        # inject_hyperparams indirection measured ~3.3 ms/step on v5e.

        self._batch_sharding = None
        self._volume_sharding = None
        self._replicated = None
        if mesh is not None:
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            if self._spatial:
                # Raw 3D batch leaves (N, H, W, D[, C]): depth over 'space'.
                self._volume_sharding = NamedSharding(
                    mesh, P("data", None, None, "space")
                )

        # Under spatial sharding the batch tuple mixes per-leaf shardings
        # (volumes vs per-sample indicator rows), so the jit inherits the
        # placements shard_batch/init_state established instead of pinning a
        # single batch sharding here.
        self._train_step = jax.jit(
            self._train_step_impl,
            in_shardings=(
                (self._replicated, self._batch_sharding, None)
                if mesh is not None and not self._spatial
                else None
            ),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            self._eval_step_impl,
            in_shardings=(
                (self._replicated, self._batch_sharding)
                if mesh is not None and not self._spatial
                else None
            ),
        )

    # ------------------------------------------------------------------ state
    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else jax.random.key(self.config.seed)
        in_channels = self.config.in_channels or transform_in_channels(
            self.config.transform_degree
        )
        spatial = tuple(
            self.config.input_shape
            or (self.config.input_size,) * self.config.spatial_dims
        )
        sample = jnp.zeros((1,) + spatial + (in_channels,))
        params = self.model.init(key, sample)
        opt_state = adam_init(params)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=opt_state,
            plateau=plateau_init(self.config.lr, mode="max"),
        )
        if self._replicated is not None:
            state = jax.device_put(state, self._replicated)
        return state

    # ------------------------------------------------------------- train step
    def _forward(self, params, images):
        return self.model.apply(params, images)

    def _losses_and_logits(self, params, images, labels, indicators, sample_mask=None):
        logits = self._forward(params, images).astype(self._metric_dtype)
        dist_maps = (
            signed_distance_maps_from_labels(labels) if self.needs_dist_maps else None
        )
        values = self.loss(logits, labels, indicators, dist_maps, sample_mask)
        return values, logits, dist_maps

    def _train_step_impl(self, state: TrainState, batch, key):
        images_raw, labels_raw, indicators = batch
        k_transform, k_mixup = jax.random.split(jax.random.fold_in(key, state.step))
        images, labels = batched_transform(
            self.train_transform, k_transform, images_raw, labels_raw
        )
        images = images.astype(self._compute_dtype)

        if self.config.mixup:
            mixed, index, lam = weighted_mixup(
                k_mixup, images, labels, self.config.mixup_alpha
            )

            def loss_fn(params):
                logits = self._forward(params, mixed).astype(self._metric_dtype)
                dist_maps = (
                    signed_distance_maps_from_labels(labels)
                    if self.needs_dist_maps
                    else None
                )
                values_a = self.loss(logits, labels, indicators, dist_maps)
                labels_b = jnp.take(labels, index, axis=0)
                indicators_b = jnp.take(indicators, index, axis=0)
                dist_b = (
                    jnp.take(dist_maps, index, axis=0)
                    if dist_maps is not None
                    else None
                )
                values_b = self.loss(logits, labels_b, indicators_b, dist_b)
                values = {
                    name: mixup_tensors(values_a[name], values_b[name], lam)
                    for name in values_a
                }
                total = self.loss.total(values)
                return total, (values, logits, labels_b)
        else:

            def loss_fn(params):
                values, logits, _ = self._losses_and_logits(
                    params, images, labels, indicators
                )
                total = self.loss.total(values)
                return total, (values, logits, labels)

        (total, (values, logits, labels_for_dice)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # Adam with the plateau-controlled learning rate.
        params, opt_state = adam_update(
            grads, state.opt_state, state.params, state.plateau.lr
        )

        # Dice logging (reference logs it every step, epoch-averaged,
        # base_trainer.py:120-136). exclude_missing zeroes the logits of
        # structures missing from each sample before argmax (a reference
        # quirk preserved: raw logits are multiplied, so negative logits
        # become 0 rather than -inf).
        def masked_preds(ind):
            if not self.config.exclude_missing:
                return squash_predictions(logits)
            spatial_ones = (1,) * (logits.ndim - 2)
            ind = ind.reshape(ind.shape[0], *spatial_ones, -1)
            return squash_predictions(
                jnp.concatenate([logits[..., :1], logits[..., 1:] * ind], axis=-1)
            )

        if self.config.mixup:
            # Each target set is scored with its own indicator
            # (reference mixup_trainer.py:94-128).
            mean_a, per_class_a = self.dice(masked_preds(indicators), labels)
            indicators_b = jnp.take(indicators, index, axis=0)
            mean_b, per_class_b = self.dice(
                masked_preds(indicators_b), labels_for_dice
            )
            dice_mean = mixup_tensors(mean_a, mean_b, lam)
            dice_per_class = mixup_tensors(per_class_a, per_class_b, lam)
        else:
            dice_mean, dice_per_class = self.dice(masked_preds(indicators), labels)

        metrics = {f"loss/{k}": v for k, v in values.items()}
        metrics["loss/total"] = total
        metrics["dice/mean"] = dice_mean
        for s, v in zip(STRUCTURES, dice_per_class):
            metrics[f"dice/{s}"] = v
        metrics["lr"] = state.plateau.lr

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            plateau=state.plateau,
        )
        return new_state, metrics

    # -------------------------------------------------------------- eval step
    def _eval_step_impl(self, params, batch):
        """One evaluation step over a possibly-padded batch.

        `row_valid` marks real rows (padded_epoch); losses and Dice exclude
        padded rows exactly, so no sample of the split is ever dropped or
        double-counted (the reference evaluates every sample,
        capstone/data/data_module.py:46-71). Returns (metrics, n_valid)."""
        images_raw, labels_raw, indicators, row_valid = batch
        key = jax.random.key(0)  # test transform is deterministic
        images, labels = batched_transform(
            self.test_transform, key, images_raw, labels_raw
        )
        values, logits, _ = self._losses_and_logits(
            params, images, labels, indicators, sample_mask=row_valid
        )
        pred_logits = logits
        if self.config.exclude_missing:
            spatial_ones = (1,) * (logits.ndim - 2)
            ind = indicators.reshape(indicators.shape[0], *spatial_ones, -1)
            pred_logits = jnp.concatenate(
                [logits[..., :1], logits[..., 1:] * ind], axis=-1
            )
        preds = squash_predictions(pred_logits)
        dice, valid = dice_per_sample_class(preds, labels)
        valid = jnp.logical_and(valid, row_valid[:, None])
        dice_per_class, _ = masked_mean_batch(dice, valid)
        dice_mean = jnp.mean(dice_per_class)
        metrics = {f"loss/{k}": v for k, v in values.items()}
        metrics["dice/mean"] = dice_mean
        for s, v in zip(STRUCTURES, dice_per_class):
            metrics[f"dice/{s}"] = v
        return metrics, jnp.sum(row_valid.astype(jnp.float32))

    # ------------------------------------------------------------------ loops
    def shard_batch(self, batch):
        if self._batch_sharding is None:
            return batch
        if self._volume_sharding is not None:
            # Spatial 3D: volume-shaped leaves (rank >= 4) additionally shard
            # depth over 'space'; per-sample rows (indicators, masks) shard
            # over 'data' only.
            shardings = jax.tree.map(
                lambda x: (
                    self._volume_sharding
                    if jnp.ndim(x) >= 4
                    else self._batch_sharding
                ),
                batch,
            )
            return jax.device_put(batch, shardings)
        return jax.device_put(batch, self._batch_sharding)

    def train_epoch(self, state, pipeline, key, logger=None):
        # Metrics accumulate as lazy device scalars; the only host sync is
        # the single fetch at epoch end (per-step float() fetches would
        # serialize dispatch and stall the device between steps).
        sums: Dict[str, jnp.ndarray] = {}
        count = 0
        for batch in pipeline.epoch(key):
            state, metrics = self._train_step(state, self.shard_batch(batch), key)
            count += 1
            for k, v in metrics.items():
                sums[k] = v if k not in sums else sums[k] + v
        # One stacked fetch: per-metric float() conversions each cost a full
        # host round trip (~8 metrics x RTT per epoch on a remote chip).
        names = list(sums)
        fetched = np.asarray(jnp.stack([sums[k] for k in names])) if names else []
        means = {
            f"train/{k}": float(v) / max(count, 1)
            for k, v in zip(names, fetched)
        }
        if logger is not None:
            logger.log(means, step=int(state.step))
        return state, means

    def eval_epoch(self, params, pipeline, prefix="val", logger=None, step=0):
        """Full-split evaluation: padded batches, sample-weighted averages.

        Batch means are weighted by the number of REAL rows in each batch, so
        the padded tail contributes in proportion to its valid samples (and
        identically to plain step-averaging when the batch size divides the
        split)."""
        sums: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros((), jnp.float32)
        for batch in pipeline.padded_epoch(None):
            metrics, n_valid = self._eval_step(params, self.shard_batch(batch))
            total = total + n_valid
            for k, v in metrics.items():
                w = v * n_valid
                sums[k] = w if k not in sums else sums[k] + w
        # Single stacked fetch (see train_epoch).
        names = list(sums)
        stacked = jnp.stack([total] + [sums[k] for k in names])
        fetched = np.asarray(stacked)
        denom = max(float(fetched[0]), 1.0)
        means = {
            f"{prefix}/{k}": float(v) / denom
            for k, v in zip(names, fetched[1:])
        }
        if logger is not None:
            logger.log(means, step=step)
        return means

    def fit(
        self,
        state: TrainState,
        train_pipeline,
        val_pipeline=None,
        epochs: Optional[int] = None,
        logger: Optional[MetricLogger] = None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        callbacks: Optional[list] = None,
    ) -> TrainState:
        """Train for `epochs`; periodic checkpoints are saved asynchronously
        (device-side snapshot + worker-thread serialization,
        training/checkpoint.py::AsyncCheckpointer) so the loop never blocks
        on the device->host fetch.

        Preemption-safe: SIGTERM (the signal TPU maintenance events and
        cluster schedulers deliver) finishes the current epoch, saves a
        resumable checkpoint to `checkpoint_dir`, and raises `Preempted`
        carrying that state — callers must NOT treat the run as complete
        (the CLIs catch it and skip their publish/test tails); `--resume`
        then continues from the checkpoint (params/opt/plateau/step all
        restore).

        `epochs` is the run's TOTAL, not an increment: a restored state
        resumes the original schedule at the epoch derived from
        `state.step` and the pipeline's steps-per-epoch, so the
        augmentation key sequence continues instead of replaying from
        epoch 0, and a state that already reached `epochs` trains no
        further."""
        import signal as _signal

        epochs = epochs or self.config.epochs
        pipeline_spe = max(1, train_pipeline.num_batches())
        # The epoch count on resume is state.step // steps_per_epoch, so the
        # schedule must come from the CHECKPOINT, not the current pipeline:
        # a resume whose pipeline length differs (e.g. --use_full_data
        # passed originally but forgotten on resume) would otherwise derive
        # the wrong start epoch and silently mis-train. Record the value at
        # the first fit so every checkpoint carries it.
        if self.config.steps_per_epoch is None:
            self.config = dataclasses.replace(
                self.config, steps_per_epoch=pipeline_spe
            )
        steps_per_epoch = int(self.config.steps_per_epoch)
        if pipeline_spe != steps_per_epoch and int(state.step) > 0:
            warnings.warn(
                f"resume: the training pipeline yields {pipeline_spe} "
                f"batches/epoch but the checkpoint's schedule is "
                f"{steps_per_epoch} — the dataset or flags (e.g. "
                f"--use_full_data) differ from the original run. The start "
                f"epoch is derived from the checkpoint's schedule; check "
                f"the invocation if this is unintended."
            )
        start_epoch = min(int(state.step) // steps_per_epoch, epochs)
        base_key = jax.random.key(self.config.seed)
        async_ckpt = ckpt.AsyncCheckpointer() if checkpoint_dir else None
        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        handler_installed = False
        prev_handler = None
        try:
            prev_handler = _signal.signal(_signal.SIGTERM, _on_sigterm)
            handler_installed = True
        except ValueError:
            pass  # not the main thread: no signal handling there
        try:
            for epoch in range(start_epoch, epochs):
                key = jax.random.fold_in(base_key, epoch)
                t0 = time.time()
                state, train_metrics = self.train_epoch(
                    state, train_pipeline, key, logger
                )
                if val_pipeline is not None:
                    val_metrics = self.eval_epoch(
                        state.params, val_pipeline, "val", logger,
                        step=int(state.step),
                    )
                    monitored = val_metrics["val/dice/mean"]
                    plateau, _ = reduce_on_plateau(
                        state.plateau,
                        monitored,
                        mode="max",
                        factor=self.config.plateau_factor,
                        patience=self.config.plateau_patience,
                        threshold=self.config.plateau_threshold,
                    )
                    state = state._replace(plateau=plateau)
                if logger is not None:
                    logger.log({"epoch": epoch, "epoch_time": time.time() - t0},
                               step=int(state.step))
                if preempted["flag"]:
                    if checkpoint_dir:
                        # Order after any in-flight save, but a STALE async
                        # failure (e.g. a transient disk error at an earlier
                        # periodic save) must not abort the grace-period
                        # save — the synchronous attempt below is the last
                        # chance to persist progress.
                        try:
                            async_ckpt.wait()
                        except RuntimeError as e:
                            print(f"ignoring earlier async save failure: {e}")
                        self.save(checkpoint_dir, state)
                    if logger is not None:
                        logger.log({"preempted_at_epoch": epoch},
                                   step=int(state.step))
                    raise Preempted(state, epoch)
                if (
                    checkpoint_dir
                    and checkpoint_every
                    and (epoch + 1) % checkpoint_every == 0
                ):
                    async_ckpt.save(
                        checkpoint_dir, state, self.config.as_dict()
                    )
                for cb in callbacks or ():
                    cb(self, state, epoch)
        finally:
            # Handler restoration must not be skipped by a failing wait(),
            # and a None previous disposition (handler installed by non-
            # Python code) still needs OUR handler removed.
            try:
                if handler_installed:
                    _signal.signal(
                        _signal.SIGTERM,
                        prev_handler
                        if prev_handler is not None
                        else _signal.SIG_DFL,
                    )
            finally:
                if async_ckpt is not None:
                    async_ckpt.wait()
        return state

    # ------------------------------------------------------------ checkpoints
    def save(self, path, state: TrainState) -> None:
        ckpt.save_checkpoint(path, state, self.config.as_dict())

    @classmethod
    def restore(cls, path, mesh=None) -> Tuple["Trainer", TrainState]:
        """Restore a (trainer, state) pair from `path`.

        `path` is either a native checkpoint directory (written by `save`)
        or a reference Lightning `.ckpt` FILE — the released Model L/M
        weights load directly in every CLI that restores by path
        (models/torch_import.py; the reference's load-released workflow,
        capstone/interpretability.py:28-31)."""
        from pathlib import Path as _Path

        p = _Path(path)
        if p.is_file() and p.suffix == ".ckpt":
            from ctseg_tpu.models.torch_import import (
                load_reference_checkpoint,
            )

            config, params = load_reference_checkpoint(str(p))
            trainer = cls(config, mesh=mesh)
            state = TrainState(
                step=jnp.asarray(0, jnp.int32),
                params=params,
                opt_state=adam_init(params),
                plateau=plateau_init(config.lr, mode="max"),
            )
            if trainer._replicated is not None:
                state = jax.device_put(state, trainer._replicated)
            return trainer, state
        config = TrainConfig.from_dict(ckpt.load_hparams(path))
        trainer = cls(config, mesh=mesh)
        template = trainer.init_state()
        state = ckpt.load_checkpoint(path, jax.device_get(template))
        return trainer, jax.device_put(state)
