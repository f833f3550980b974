"""Evaluation: per-structure Dice + HD95 reports from a checkpoint.

Covers the reference's `trainer.test(...)` path (base_trainer.py:246) and
extends it with HD95 and whole-volume sliding-window evaluation (the north
star's "vols/min" benchmark mode). Results print as a table and are written
to JSON for the parity report against BASELINE.md.

Usage:
    python -m ctseg_tpu.inference.evaluate --checkpoint CKPT [--data_dir DIR]
        [--split test] [--hd95] [--out results.json]
"""

import json
import time
from argparse import ArgumentParser
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.constants import NUM_CLASSES, STRUCTURES
from ctseg_tpu.data.datasets import PackedDataset2D, PackedDataset3D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.metrics import dice_per_sample_class, masked_mean_batch
from ctseg_tpu.metrics.hd95 import hd95_per_structure_device
from ctseg_tpu.ops import squash_predictions
from ctseg_tpu.paths import DEFAULT_DATA_STORAGE
from ctseg_tpu.training.trainer import Trainer
from ctseg_tpu.transforms.pipelines import batched_transform

# Volumes per jitted group call: bounds HBM use (a uniform-shape dataset
# would otherwise stack arbitrarily many volumes into one device array) and
# gives the double-buffered staging a unit of overlap.
GROUP_CHUNK = 8


# Canonical implementations live in inference/sliding_window.py (shared
# with predict.py / serve.py); module-level aliases keep this the patch
# point for the perf probes (perf/probe_cold_eval.py).
from ctseg_tpu.inference.sliding_window import (  # noqa: E402
    bucketed_grid as _bucketed_grid,
    pad_volume_dhw as _pad_volume_dhw,
)


def evaluate_2d(
    trainer: Trainer,
    params,
    dataset: PackedDataset2D,
    batch_size: Optional[int] = None,
    with_hd95: bool = False,
    mesh=None,
) -> Dict:
    """Slice-wise evaluation with dataset-level (not step-averaged) Dice.

    Unlike the training-loop logging (which mirrors the reference's
    step-averaged Lightning semantics), this accumulates per-(sample, class)
    Dice over the WHOLE split before the masked reduction — the statistically
    correct aggregate for final reporting. Every slice of the split is
    evaluated exactly once: the trailing partial batch is padded and its
    padded rows masked out of the Dice `valid` channel (the reference's
    DataLoaders never drop samples, capstone/data/data_module.py:46-71).
    """
    if len(dataset) == 0:
        raise ValueError("evaluate_2d: empty dataset")
    batch_size = batch_size or min(64, len(dataset))
    batch_size = min(batch_size, len(dataset))
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Data-parallel evaluation: batches sharded over the mesh's data
        # axis, params replicated; XLA inserts the collectives.
        batch_size = max((batch_size // mesh.size) * mesh.size, mesh.size)
        batch_sharding = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, NamedSharding(mesh, P()))
    pipe = DevicePipeline2D(dataset, batch_size)

    # Per-slice in-plane (row, col) spacing -> millimetre HD95, same
    # contract as the 3D path below. padded_epoch(None) walks the split in
    # dataset order with index-0 padding rows (data/pipeline.py:30-37), so
    # the per-batch spacing rows are a plain strided slice of the padded
    # spacing table; padded rows are masked out via row_valid regardless.
    spacings_np = getattr(dataset, "spacings", None)
    use_spacing = with_hd95 and spacings_np is not None
    if use_spacing:
        num_batches = -(-len(dataset) // batch_size)
        pad = num_batches * batch_size - len(dataset)
        spacings_padded = np.concatenate(
            [spacings_np, np.repeat(spacings_np[:1], pad, axis=0)]
        ) if pad else spacings_np

    @jax.jit
    def step(params, images_raw, labels_raw, indicators, row_valid,
             spacing=None):
        key = jax.random.key(0)
        images, labels = batched_transform(
            trainer.test_transform, key, images_raw, labels_raw
        )
        logits = trainer.model.apply(params, images)
        if trainer.config.exclude_missing:
            # Mirror the trainer's own eval step (and the reference's test
            # protocol, base_trainer.py:120-136): logits of structures
            # missing from a sample are zeroed before argmax so voxels
            # can't be assigned to an unannotated class.
            ind = indicators.reshape(
                indicators.shape[0], *(1,) * (logits.ndim - 2), -1
            )
            logits = jnp.concatenate(
                [logits[..., :1], logits[..., 1:] * ind], axis=-1
            )
        preds = squash_predictions(logits)
        dice, valid = dice_per_sample_class(preds, labels)
        valid = jnp.logical_and(valid, row_valid[:, None])
        if with_hd95:
            # Device HD95 (metrics/hd95.py): (value, valid) pairs; padded
            # rows are masked out via row_valid like the Dice metric.
            if spacing is not None:
                # The metric runs on the model grid (test transform is
                # window + resize + normalize, transforms/pipelines.py:51),
                # so the header spacing scales by raw/model size per axis.
                scale = jnp.asarray(
                    [
                        images_raw.shape[1] / labels.shape[1],
                        images_raw.shape[2] / labels.shape[2],
                    ],
                    jnp.float32,
                )
                spacing = spacing * scale

                def one(p, t, v, sp):
                    vals, ok = hd95_per_structure_device(
                        p, t, NUM_CLASSES, spacing=sp
                    )
                    return vals, jnp.logical_and(ok, v)

                hd, hd_valid = jax.vmap(one)(
                    preds, labels, row_valid, spacing
                )
            else:

                def one(p, t, v):
                    vals, ok = hd95_per_structure_device(p, t, NUM_CLASSES)
                    return vals, jnp.logical_and(ok, v)

                hd, hd_valid = jax.vmap(one)(preds, labels, row_valid)
            return dice, valid, hd, hd_valid
        zeros = jnp.zeros((preds.shape[0], NUM_CLASSES - 1))
        return dice, valid, zeros, zeros > 0

    all_dice, all_valid, all_rows = [], [], []
    hd_rows, hd_valid_rows = [], []
    t0 = time.time()
    for b, (images_raw, labels_raw, indicators, row_valid) in enumerate(
        pipe.padded_epoch(None)
    ):
        sp = None
        if use_spacing:
            sp = jnp.asarray(
                spacings_padded[b * batch_size:(b + 1) * batch_size]
            )
        if batch_sharding is not None:
            images_raw, labels_raw, indicators, row_valid = jax.device_put(
                (images_raw, labels_raw, indicators, row_valid), batch_sharding
            )
            if sp is not None:
                sp = jax.device_put(sp, batch_sharding)
        dice, valid, hd, hd_valid = step(
            params, images_raw, labels_raw, indicators, row_valid, sp
        )
        # Device-resident accumulation: per-batch np.asarray would force a
        # host sync each batch and serialize dispatch against compute.
        # row_valid accumulates too so num_slices reports the count of REAL
        # rows actually evaluated (padded_epoch's contract), not a restated
        # len(dataset) — parity_report's coverage assert checks it.
        all_dice.append(dice)
        all_valid.append(valid)
        all_rows.append(row_valid)
        if with_hd95:
            hd_rows.append(hd)
            hd_valid_rows.append(hd_valid)
    dice = jnp.concatenate(all_dice)
    valid = jnp.concatenate(all_valid)
    float(dice.ravel()[0])  # full sync (axon block_until_ready returns early)
    elapsed = time.time() - t0
    n_slices = int(jnp.sum(jnp.concatenate(all_rows).astype(jnp.int32)))
    per_class, not_nans = masked_mean_batch(dice, valid)
    per_class = np.asarray(per_class)

    result = {
        "mean_dice": float(per_class.mean()),
        "per_structure_dice": {
            s: float(v) for s, v in zip(STRUCTURES, per_class)
        },
        "slices_per_sec": n_slices / max(elapsed, 1e-9),
        "num_slices": n_slices,
    }
    if with_hd95:
        # (value, valid) aggregation, mirroring the Dice reduction; None
        # marks structures with no valid (pred AND target nonempty) sample.
        hd_mean, hd_n = masked_mean_batch(
            jnp.concatenate(hd_rows), jnp.concatenate(hd_valid_rows)
        )
        hd_mean, hd_n = np.asarray(hd_mean), np.asarray(hd_n)
        result["per_structure_hd95"] = {
            s: (float(v) if n > 0 else None)
            for s, v, n in zip(STRUCTURES, hd_mean, hd_n)
        }
        # Millimetres when the packed split carries per-slice in-plane
        # spacing (written by the 2D converter from the NRRD header,
        # scaled to the model grid above); voxel units for legacy packed
        # files — same contract as the 3D path below.
        result["hd95_unit"] = "mm" if use_spacing else "voxel"
    return result


def sliding_window_throughput(
    trainer: Trainer,
    params,
    dataset,
    patch_size=(128, 128, 48),
    overlap: float = 0.5,
    batch_size: int = 4,
    reps: int = 3,
) -> Dict:
    """Steady-state whole-volume inference throughput, device-resident.

    Stages every volume in HBM once, then times repeated sliding-window
    forward passes (Gaussian blending included, metrics excluded). This is
    the hardware's serving capability; `evaluate_3d_sliding_window`'s
    vols_per_min additionally pays the host->device copy of each volume,
    which on this container's tunneled TPU costs more than the compute
    itself (a local TPU host moves volumes at PCIe rates instead).
    """
    from ctseg_tpu.inference.sliding_window import bucketed_swin_runner

    if len(dataset.images) == 0:
        raise ValueError("sliding_window_throughput: empty dataset")

    # One runner per BUCKET shape (depths rounded up to the window grid,
    # window-count neutral), shared with predict/serve through
    # `trainer._swin_cache`: a warm trainer that already served a split
    # re-times here without recompiling, and the windowing/squash math
    # cannot diverge between the timed path and the serving path.
    patch_size = tuple(int(p) for p in patch_size)
    infer_fns = {}
    vols = []
    for img in dataset.images:
        bucket, starts = _bucketed_grid(img.shape, patch_size, overlap)
        if bucket not in infer_fns:
            infer_fns[bucket] = bucketed_swin_runner(
                trainer, bucket, patch_size, overlap, batch_size
            )
        padded = _pad_volume_dhw(img, bucket, fill=-1024.0)
        vols.append((bucket, jnp.asarray(padded), jnp.asarray(starts)))
    for bucket, v, s in vols:  # compile every bucket + stage sync
        out = infer_fns[bucket](params, v, s)
    float(out.ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        for bucket, v, s in vols:
            out = infer_fns[bucket](params, v, s)
    float(out.ravel()[0].astype(jnp.float32))
    elapsed = time.time() - t0
    n = reps * len(vols)
    return {
        "vols_per_min": n / max(elapsed / 60.0, 1e-9),
        "ms_per_volume": elapsed / n * 1000.0,
        "num_volumes": len(vols),
        "compiled_programs": len(infer_fns),
        "reps": reps,
    }


def evaluate_3d_sliding_window(
    trainer: Trainer,
    params,
    dataset,
    patch_size=(128, 128, 48),
    overlap: float = 0.5,
    batch_size: int = 4,
    window: bool = True,
    with_hd95: bool = False,
    mesh=None,
) -> Dict:
    """Whole-volume 3D evaluation via sliding-window Gaussian blending.

    North-star capability (BASELINE.json "vols/min"): each native-resolution
    volume is covered by overlapping patches; per-structure Dice (+HD95) are
    computed on the full volume. `window` applies soft-tissue HU windowing
    (matching the patch trainer); parity-mode resize checkpoints should pass
    window=False.

    HD95 units: when the dataset carries per-patient voxel spacing
    (PackedDataset3D.spacings, written by the converter from the NRRD
    header), distances are physical (mm for PDDCA) — comparable to
    published HaN numbers; legacy packed files without spacing report
    voxel units. `hd95_unit` in the result records which.

    Cold-start: volumes are bucketed onto the window grid (depths rounded
    up by at most one window stride — window-count neutral) and everything
    per-volume is a traced argument, so heterogeneous-depth datasets share
    one compiled program per bucket; `compiled_programs` in the result
    records how many were built. Predictions inside each true extent are
    bit-identical to per-shape compilation (each volume keeps its exact
    clamped window grid; bucket padding gets zero blend weight and is
    masked out of every metric).
    """
    from ctseg_tpu.inference.sliding_window import build_sliding_window_fn
    from ctseg_tpu.transforms.windowing import apply_window

    if len(dataset.images) == 0:
        raise ValueError("evaluate_3d_sliding_window: empty dataset")

    # Volumes are evaluated in BUCKET groups of at most GROUP_CHUNK, each
    # chunk as a single jitted call that lax.map's the whole per-volume
    # pipeline (layout change, windowing, sliding-window forward, squash,
    # Dice [+ device HD95]) over one stacked array. One host->device
    # transfer and one dispatch per chunk: per-volume transfers + eager
    # glue measured ~10x slower than the runner's own compute on the
    # tunneled v5e (perf/probe_swin.py). Chunks are double-buffered: the
    # next chunk's host->device upload is issued while the current chunk
    # computes.
    #
    # Compile count is the cold-start cost on this chip (30-90s per jitted
    # program), so everything per-volume is a traced ARGUMENT of one shared
    # program per bucket: params, voxel spacing, the volume's exact clamped
    # window grid (same count within a bucket by construction), its true
    # extent (metrics masked by iota), and a row-validity flag (the last
    # partial chunk is padded to GROUP_CHUNK instead of compiling a second
    # program). Real PDDCA — 15 patients, 15 distinct depths — compiles
    # ONE sliding-window program instead of ~16.
    spacings = getattr(dataset, "spacings", None)
    use_spacing = with_hd95 and spacings is not None

    def make_group_fn(bucket_hwd):
        hb, wb, db = bucket_hwd
        runner = build_sliding_window_fn(
            trainer.model.apply,
            bucket_hwd,
            patch_size,
            overlap=overlap,
            batch_size=batch_size,
            out_channels=NUM_CLASSES,
            mesh=mesh,
            dynamic_starts=True,
        )

        def one(params, img, lab, ind, spc, starts, dims, row_ok):
            # (D, H, W) -> (H, W, D, 1)
            vol = jnp.moveaxis(img.astype(jnp.float32), 0, -1)[..., None]
            if window:
                vol = apply_window(vol, 350, 20, shift=True)
            logits = runner(params, vol, starts)
            if trainer.config.exclude_missing:
                # Mirror the trainer's eval step: structures missing from
                # this patient's annotations can't win the argmax.
                logits = jnp.concatenate(
                    [logits[..., :1], logits[..., 1:] * ind], axis=-1
                )
            preds = squash_predictions(logits)
            # Mask out the bucket padding: pred voxels beyond the true
            # (h, w, d) extent become background, and host-padded labels
            # are already 0 there, so per-structure Dice and HD95 equal
            # the unpadded computation exactly (classes 1..9 gain no
            # intersection, union, or surface voxels from the pad).
            inb = (
                (jnp.arange(hb)[:, None, None] < dims[0])
                & (jnp.arange(wb)[None, :, None] < dims[1])
                & (jnp.arange(db)[None, None, :] < dims[2])
            )
            preds = jnp.where(inb, preds, 0)
            target = jnp.moveaxis(lab.astype(jnp.int32), 0, -1)
            dice, valid = dice_per_sample_class(preds[None], target[None])
            valid = jnp.logical_and(valid, row_ok)
            if with_hd95:
                # HD95 on device: never materializes volume-sized
                # predictions outside the jit (metrics/hd95.py). (value,
                # valid) pairs like every metric here. `spc` is z-first
                # (D, H, W); the label maps are (H, W, D).
                spacing = (
                    jnp.stack([spc[1], spc[2], spc[0]])
                    if use_spacing else None
                )
                hd, hd_ok = hd95_per_structure_device(
                    preds, target, NUM_CLASSES, spacing=spacing
                )
                return dice[0], valid[0], hd, jnp.logical_and(hd_ok, row_ok)
            return dice[0], valid[0]

        @jax.jit
        def run(params, imgs, labs, inds, spcs, starts, dims, row_ok):
            return jax.lax.map(
                lambda t: one(params, *t),
                (imgs, labs, inds, spcs, starts, dims, row_ok),
            )

        return run

    buckets: Dict = {}
    vol_grid = {}
    for i, img in enumerate(dataset.images):
        bucket, starts = _bucketed_grid(img.shape, patch_size, overlap)
        buckets.setdefault(bucket, []).append(i)
        vol_grid[i] = starts
    group_fns = {bucket: make_group_fn(bucket) for bucket in buckets}

    # Work items: (bucket, chunk of <= GROUP_CHUNK volume indices). The
    # last chunk is padded to GROUP_CHUNK by repeating its first index
    # with row_ok=False (masked out of every reduction) whenever the
    # bucket holds more than one chunk — reusing the full-chunk program
    # instead of compiling a partial-chunk one. A bucket that fits in a
    # single smaller chunk keeps its exact size (padding would only
    # inflate the one program it compiles anyway).
    items = []
    for bucket, idxs in buckets.items():
        for lo in range(0, len(idxs), GROUP_CHUNK):
            chunk = idxs[lo : lo + GROUP_CHUNK]
            n_real = len(chunk)
            if n_real < GROUP_CHUNK and len(idxs) > GROUP_CHUNK:
                chunk = chunk + [chunk[0]] * (GROUP_CHUNK - n_real)
            items.append((bucket, chunk, n_real))

    img_fill = -1024.0 if window else 0.0

    def stage(item):
        """Host-stack one chunk and start its async host->device upload."""
        bucket, idxs, n_real = item
        imgs = np.stack(
            [_pad_volume_dhw(dataset.images[i], bucket, img_fill)
             for i in idxs]
        )
        labs = np.stack(
            [_pad_volume_dhw(dataset.labels[i], bucket, 0) for i in idxs]
        )
        inds = np.stack(
            [np.asarray(dataset.indicators[i], np.float32) for i in idxs]
        )
        spcs = np.stack(
            [spacings[i] for i in idxs] if use_spacing
            else [np.ones(3, np.float32)] * len(idxs)
        )
        starts = np.stack([vol_grid[i] for i in idxs])
        dims = np.stack(
            [np.array(
                [dataset.images[i].shape[1], dataset.images[i].shape[2],
                 dataset.images[i].shape[0]], np.int32,
            ) for i in idxs]
        )
        row_ok = np.arange(len(idxs)) < n_real
        return bucket, tuple(
            jax.device_put(x)
            for x in (imgs, labs, inds, spcs, starts, dims, row_ok)
        )

    all_dice, all_valid, hd_rows, hd_valid_rows = [], [], [], []
    t0 = time.time()
    # Double-buffer through a worker THREAD: on a tunneled chip
    # jax.device_put BLOCKS for the whole transfer (measured 3.9 s per
    # 131 MB chunk at the EVIDENCE shape, perf/probe_eval_inloop.py — the
    # dominant in-loop cost), so staging inline after the dispatch never
    # overlapped anything. The worker uploads chunk k+1 while the device
    # computes chunk k; device_put is thread-safe and the main thread only
    # dispatches.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(stage, items[0])
        for k in range(len(items)):
            bucket, args = fut.result()
            if k + 1 < len(items):
                fut = ex.submit(stage, items[k + 1])
            out = group_fns[bucket](params, *args)  # async dispatch
            all_dice.append(out[0])
            all_valid.append(out[1])
            if with_hd95:
                hd_rows.append(out[2])
                hd_valid_rows.append(out[3])
    dice = jnp.concatenate(all_dice)
    valid = jnp.concatenate(all_valid)
    float(dice.ravel()[0])  # full sync (axon block_until_ready returns early)
    elapsed = time.time() - t0
    per_class, _ = masked_mean_batch(dice, valid)
    per_class = np.asarray(per_class)
    result = {
        "mean_dice": float(per_class.mean()),
        "per_structure_dice": {
            s: float(v) for s, v in zip(STRUCTURES, per_class)
        },
        "vols_per_min": len(dataset.images) / max(elapsed / 60.0, 1e-9),
        "num_volumes": len(dataset.images),
        "compiled_programs": len(group_fns),
    }
    if with_hd95:
        # (value, valid) aggregation, mirroring the Dice reduction; None
        # marks structures with no valid (pred AND target nonempty) sample.
        hd_mean, hd_n = masked_mean_batch(
            jnp.concatenate(hd_rows), jnp.concatenate(hd_valid_rows)
        )
        hd_mean, hd_n = np.asarray(hd_mean), np.asarray(hd_n)
        result["per_structure_hd95"] = {
            s: (float(v) if n > 0 else None)
            for s, v, n in zip(STRUCTURES, hd_mean, hd_n)
        }
        result["hd95_unit"] = "mm" if use_spacing else "voxel"
    return result


def format_table(result: Dict) -> str:
    hd_hdr = ""
    if "per_structure_hd95" in result:
        # Always label the unit: a bare HD95 column reads as millimetres,
        # which is wrong for legacy packed data without voxel spacing.
        unit = {"mm": "mm", "voxel": "vox"}.get(
            result.get("hd95_unit", "voxel"), "vox"
        )
        hd_hdr = f" {f'HD95({unit})':>10}"
    lines = [f"{'Structure':<18} {'Dice':>8}" + hd_hdr]
    for s in STRUCTURES:
        row = f"{s:<18} {result['per_structure_dice'][s] * 100:>8.2f}"
        if "per_structure_hd95" in result:
            v = result["per_structure_hd95"][s]
            row += f" {v:>10.2f}" if v is not None else f" {'n/a':>10}"
        lines.append(row)
    lines.append(f"{'Mean':<18} {result['mean_dice'] * 100:>8.2f}")
    return "\n".join(lines)


def main(argv=None):
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = ArgumentParser(
        description="Evaluate a checkpoint on a packed split: per-structure "
        "Dice (+HD95). 2D slice checkpoints run the slice pipeline; 3D "
        "checkpoints run whole-volume sliding-window evaluation (auto-"
        "detected from the checkpoint's embedded hparams, like predict.py)."
    )
    from ctseg_tpu.models.released import (
        add_released_args,
        resolve_checkpoint_arg,
    )

    parser.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="native checkpoint dir or a reference Lightning .ckpt file",
    )
    add_released_args(parser)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--hd95", action="store_true", default=False)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument(
        "--n_devices",
        type=int,
        default=None,
        help="Evaluate data-parallel over an n-device mesh (defaults to all "
        "devices when >1 are visible; 1 disables the mesh).",
    )
    parser.add_argument(
        "--patch_size", type=int, nargs=3, default=(128, 128, 48),
        help="3D checkpoints: sliding-window patch size",
    )
    parser.add_argument("--overlap", type=float, default=0.5,
                        help="3D checkpoints: sliding-window overlap")
    parser.add_argument(
        "--throughput", action="store_true", default=False,
        help="3D checkpoints: also report steady-state device-resident "
        "vols/min (volumes staged in HBM once, metrics excluded)",
    )
    args = parser.parse_args(argv)

    n_dev = args.n_devices or len(jax.devices())
    mesh = None
    if n_dev > 1:
        from ctseg_tpu.parallel import make_mesh

        mesh = make_mesh(n_dev)

    trainer, state = Trainer.restore(resolve_checkpoint_arg(args), mesh=mesh)

    if trainer.config.spatial_dims == 3:
        data_dir = Path(
            args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_3d")
        )
        dataset = PackedDataset3D.load(data_dir / f"{args.split}_packed.npz")
        patch = tuple(args.patch_size)
        result = evaluate_3d_sliding_window(
            trainer, state.params, dataset,
            patch_size=patch, overlap=args.overlap,
            window=trainer.config.volumetric_mode == "patch",
            with_hd95=args.hd95, mesh=mesh,
        )
        if args.throughput:
            result["throughput"] = sliding_window_throughput(
                trainer, state.params, dataset,
                patch_size=patch, overlap=args.overlap,
            )
    else:
        data_dir = Path(
            args.data_dir or (Path(DEFAULT_DATA_STORAGE) / "miccai_2d")
        )
        dataset = PackedDataset2D.load(data_dir / f"{args.split}_packed.npz")
        result = evaluate_2d(
            trainer, state.params, dataset,
            batch_size=args.batch_size, with_hd95=args.hd95, mesh=mesh,
        )
    print(format_table(result))
    if "vols_per_min" in result:
        print(f"vols/min (incl. transfers): {result['vols_per_min']:.2f}")
    if "throughput" in result:
        print(
            "vols/min (steady-state, device-resident): "
            f"{result['throughput']['vols_per_min']:.2f}"
        )
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
