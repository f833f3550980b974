"""Sliding-window whole-volume inference with Gaussian overlap blending.

New capability relative to the reference, required by the benchmark north
star (BASELINE.json): the reference only does per-slice full-image 2D or
whole-resized-volume 3D inference (SURVEY.md §3.5). Here a volume of any
size is covered by a static grid of overlapping windows; each window's
logits are weighted by a separable Gaussian importance map and scatter-added
into the output, then normalized — MONAI-style blending, built TPU-first:

  - the window grid is computed statically (python ints), so the whole
    inference is one jitted scan with static shapes;
  - patches are processed in fixed-size batches to bound memory;
  - with a mesh, window batches are sharded over the 'data' axis (windows
    are embarrassingly parallel) and the scatter-add happens on gathered
    results; see inference/spatial_sharded.py for the depth-sharded
    halo-exchange variant that also shards the volume itself.

Works for 2D (H, W) and 3D (D, H, W) volumes with any channel count.
"""

import itertools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _window_starts(size: int, patch: int, overlap: float) -> list:
    """Static start offsets covering [0, size) with >= `overlap` fraction."""
    assert patch <= size, f"patch {patch} larger than volume axis {size}"
    if patch == size:
        return [0]
    step = max(1, int(patch * (1.0 - overlap)))
    starts = list(range(0, size - patch + 1, step))
    if starts[-1] != size - patch:
        starts.append(size - patch)
    return starts


def window_step(patch: int, overlap: float) -> int:
    """The stride between window starts along one axis."""
    return max(1, int(patch * (1.0 - overlap)))


def bucket_axis(size: int, patch: int, overlap: float) -> int:
    """Round `size` up to the window grid: the smallest s' >= max(size,
    patch) of the form patch + k*step.

    Window-count neutral by construction: count(s) = ceil((s-p)/step)+1 for
    s > p, so every size in (p+(k-1)*step, p+k*step] has the same count as
    the bucket p+k*step. Volumes padded to their bucket therefore share a
    sliding-window program of identical window count — the compiled program
    becomes reusable across patients whose depths differ (the cold-eval
    compile-count fix; see evaluate_3d_sliding_window).
    """
    if size <= patch:
        return patch
    step = window_step(patch, overlap)
    return patch + -(-(size - patch) // step) * step


def bucketed_grid(raw_shape_dhw, patch_size, overlap):
    """Bucket a (D, H, W) volume onto the sliding-window grid.

    Returns (bucket_hwd, starts): the (H, W, D) runner shape rounded up to
    the window grid (window-count neutral — bucket_axis), and this
    volume's exact clamped window grid computed over max(true, patch) per
    axis — identical to the grid an unbucketed runner would use, so
    blended predictions inside the true extent are bit-identical to
    per-shape compilation. Padded voxels beyond the clamped grid get zero
    blend weight.
    """
    d, h, w = raw_shape_dhw
    true_hwd = (h, w, d)
    # Bucket ONLY the depth axis: PDDCA scans share one in-plane size after
    # the anatomical crop (512x512 -> 280x280) while depth varies per
    # patient, so rounding H/W up to the window grid bought no program
    # sharing — it only inflated every runner/metric program by the pad
    # voxels (280->320 per axis, 1.31x; measured transfer+EDT-bound eval
    # loop, perf/probe_eval_inloop.py). H/W stay exact (clamped starts are
    # traced arguments, so in-plane grids need no padding); depth keeps the
    # window-count-neutral bucket that lets mixed-depth datasets share one
    # compiled program (2.72x cold eval, perf/probe_cold_eval.py).
    bucket = (
        max(h, patch_size[0]),
        max(w, patch_size[1]),
        bucket_axis(d, patch_size[2], overlap),
    )
    hp = tuple(max(s, p) for s, p in zip(true_hwd, patch_size))
    starts = compute_window_grid(hp, patch_size, overlap)
    expected = len(compute_window_grid(bucket, patch_size, overlap))
    assert len(starts) == expected, (raw_shape_dhw, bucket)
    return bucket, starts


def pad_volume_dhw(arr: np.ndarray, bucket_hwd, fill) -> np.ndarray:
    """Host-pad a (D, H, W) array up to the (H, W, D) bucket shape.

    The image fill is -1024 HU (air): soft-tissue windowing clips it to the
    window minimum, which shifts to exactly 0.0 — the same value the
    pre-bucketing code produced by zero-padding AFTER windowing, so
    predictions near the volume edge are unchanged. When the array's dtype
    cannot represent the fill (uint8/uint16 scans, a supported NRRD input
    type), the pad is materialized in float32 instead — np.full would
    silently WRAP -1024 to 64512, which windows to max-intensity tissue
    (1.0) instead of air (0.0) and changes boundary-window predictions.
    """
    hb, wb, db = bucket_hwd
    d, h, w = arr.shape
    if (h, w, d) == (hb, wb, db):
        return arr
    dtype = arr.dtype
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        if not info.min <= fill <= info.max:
            dtype = np.float32
    out = np.full((db, hb, wb), fill, dtype=dtype)
    out[:d, :h, :w] = arr
    return out


def compute_window_grid(
    spatial_shape: Sequence[int], patch_size: Sequence[int], overlap: float
) -> np.ndarray:
    """(N_windows, ndim) int array of window start corners (static)."""
    per_axis = [
        _window_starts(s, p, overlap) for s, p in zip(spatial_shape, patch_size)
    ]
    return np.array(list(itertools.product(*per_axis)), dtype=np.int32)


def gaussian_importance(
    patch_size: Sequence[int], sigma_scale: float = 0.125, dtype=jnp.float32
) -> jnp.ndarray:
    """Separable Gaussian importance map, 1.0 at the center (MONAI-style)."""
    maps = []
    for p in patch_size:
        center = (p - 1) / 2.0
        sigma = max(p * sigma_scale, 1e-3)
        x = np.arange(p, dtype=np.float64)
        g = np.exp(-0.5 * ((x - center) / sigma) ** 2)
        maps.append(g / g.max())
    out = np.ones([], dtype=np.float64)
    for i, g in enumerate(maps):
        shape = [1] * len(patch_size)
        shape[i] = -1
        out = out * g.reshape(shape)
    # Floor so single-window corner voxels stay numerically exact after the
    # acc/weight division (3D corners reach ~1e-10 otherwise).
    out = np.maximum(out, 1e-6)
    return jnp.asarray(out, dtype=dtype)


def blend_accumulate(
    volume: jnp.ndarray,
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    starts: np.ndarray,
    patch_size: Tuple[int, ...],
    importance: jnp.ndarray,
    out_channels: int,
    batch_size: int,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core scatter-add: run the windows at `starts`, return (acc, weight).

    Traceable (usable inside jit / shard_map). `starts` may be static
    (numpy) or a traced (n_windows, ndim) int32 array — the gathers and
    scatters are dynamic_slice/dynamic_update_slice either way, so tracing
    the starts costs nothing and lets one compiled program serve every
    volume with the same padded shape and window count (clamped per-volume
    grids stay bit-identical to the static-starts program).
    """
    ndim = len(patch_size)
    spatial_shape = volume.shape[:ndim]
    n_windows = len(starts)
    importance_c = importance[..., None]

    n_batches = math.ceil(n_windows / batch_size)
    pad = n_batches * batch_size - n_windows
    xp = np if isinstance(starts, np.ndarray) else jnp
    starts_padded = xp.concatenate(
        [starts, xp.repeat(starts[-1:], pad, axis=0)], axis=0
    ).astype(xp.int32)
    valid = np.concatenate(
        [np.ones(n_windows, np.float32), np.zeros(pad, np.float32)]
    )
    starts_dev = jnp.asarray(starts_padded).reshape(n_batches, batch_size, ndim)
    valid_dev = jnp.asarray(valid).reshape(n_batches, batch_size)

    def gather_patch(start):
        idx = tuple(start[i] for i in range(ndim)) + (jnp.int32(0),)
        return jax.lax.dynamic_slice(volume, idx, patch_size + (volume.shape[-1],))

    def scan_body(carry, xs):
        acc, weight = carry
        batch_starts, batch_valid = xs
        patches = jax.vmap(gather_patch)(batch_starts)
        if mesh is not None:
            # Shard the window batch over the mesh's data axis: windows are
            # embarrassingly parallel; XLA gathers logits for the scatter.
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert "data" in mesh.axis_names, (
                f"blend_accumulate shards windows over a 'data' axis; this "
                f"mesh has axes {mesh.axis_names} — build it with make_mesh "
                "or rename the batch axis to 'data'"
            )
            patches = jax.lax.with_sharding_constraint(
                patches, NamedSharding(mesh, P("data"))
            )
        logits = apply_fn(patches).astype(jnp.float32)
        weighted = logits * importance_c[None]

        def scatter_one(i, carry):
            acc, weight = carry
            start = batch_starts[i]
            zero = jnp.int32(0)
            idx = tuple(start[j] for j in range(ndim)) + (zero,)
            v = batch_valid[i]
            acc_patch = jax.lax.dynamic_slice(
                acc, idx, patch_size + (out_channels,)
            )
            acc = jax.lax.dynamic_update_slice(
                acc, acc_patch + weighted[i] * v, idx
            )
            w_patch = jax.lax.dynamic_slice(
                weight, idx[:-1] + (zero,), patch_size + (1,)
            )
            weight = jax.lax.dynamic_update_slice(
                weight, w_patch + importance_c * v, idx[:-1] + (zero,)
            )
            return acc, weight

        acc, weight = jax.lax.fori_loop(0, batch_size, scatter_one, (acc, weight))
        return (acc, weight), None

    # Derive the zero initializers from the volume so they inherit its
    # varying-manual-axes status under shard_map (plain jnp.zeros would be
    # device-invariant and trip the scan carry type check).
    tie = 0.0 * volume[..., :1].astype(jnp.float32)
    acc = jnp.zeros(spatial_shape + (out_channels,), jnp.float32) + tie
    weight = jnp.zeros(spatial_shape + (1,), jnp.float32) + tie
    (acc, weight), _ = jax.lax.scan(
        scan_body, (acc, weight), (starts_dev, valid_dev)
    )
    return acc, weight


def build_sliding_window_fn(
    apply_fn: Callable,
    spatial_shape: Sequence[int],
    patch_size: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    mode: str = "gaussian",
    out_channels: int = 10,
    mesh: Optional[jax.sharding.Mesh] = None,
    dynamic_starts: bool = False,
) -> Callable:
    """Build a reusable jitted runner: (params, volume) -> blended logits.

    `apply_fn(params, patches)` takes the model params explicitly so they
    stay jit ARGUMENTS — closing over them would bake all weights into the
    program as constants AND defeat the jit cache, recompiling per volume.

    With `dynamic_starts`, the runner takes the window grid as a traced
    argument — `run(params, volume, starts)` with `starts` of shape
    (n_windows, ndim) int32 and the SAME window count as this builder's
    `spatial_shape` grid. Volumes whose true extents fall in the same
    bucket (`bucket_axis` per axis) then share one compiled program while
    keeping their own exact clamped grids; regions no window touches get
    zero blend weight (logits 0 after the guarded division).
    """
    patch_size = tuple(int(p) for p in patch_size)
    spatial_shape = tuple(int(s) for s in spatial_shape)
    starts = compute_window_grid(spatial_shape, patch_size, overlap)
    if mode == "gaussian":
        importance = gaussian_importance(patch_size)
    else:
        importance = jnp.ones(patch_size, jnp.float32)

    # The importance map is a jit ARGUMENT like the params: a default patch
    # is a ~3 MB f32 array, and closing over it would bake an HLO constant
    # into every compiled runner (one per volume-shape group in
    # evaluate_3d_sliding_window) — CLAUDE.md perf rule 2.
    @jax.jit
    def _run(params, volume, importance, starts):
        acc, weight = blend_accumulate(
            volume,
            lambda patches: apply_fn(params, patches),
            starts, patch_size, importance, out_channels, batch_size, mesh,
        )
        return acc / jnp.maximum(weight, 1e-30)

    n_windows = len(starts)

    if dynamic_starts:
        def run(params, volume, run_starts):
            assert run_starts.shape == (n_windows, len(patch_size)), (
                f"dynamic starts {run_starts.shape} != grid "
                f"({n_windows}, {len(patch_size)}) of padded shape "
                f"{spatial_shape} — bucket the volume with bucket_axis"
            )
            return _run(params, volume, importance, run_starts)
    else:
        starts_const = jnp.asarray(starts)

        def run(params, volume):
            return _run(params, volume, importance, starts_const)

    return run


def bucketed_swin_runner(
    trainer,
    bucket_hwd: Tuple[int, int, int],
    patch_size: Tuple[int, int, int],
    overlap: float,
    batch_size: int,
):
    """One cached jitted 3D label-map program per window-grid bucket.

    (params, padded_volume (D,H,W) raw HU, starts) -> (H, W, D) labels:
    the checkpoint's input transform + sliding-window Gaussian blending +
    squash_predictions, with the volume's exact clamped window grid as a
    traced argument. Patch-mode checkpoints trained on soft-tissue-windowed
    patches (volumetric/trainer3d.py::_windowed_patch_transform) get the
    same windowing here; resize-mode parity checkpoints trained on raw HU
    (the reference applies no windowing, volumetric/predefined.py:4-7) get
    raw HU — mirroring evaluate_3d_sliding_window's gating, so predict/
    serve/evaluate all feed a checkpoint the distribution it trained on.
    Cached on the Trainer instance (`trainer._swin_cache`)
    so every consumer — the predict CLI looping over a split, the warm HTTP
    server, and `evaluate --throughput` — reuses one compiled program per
    bucket (real PDDCA depths vary per patient; a per-shape jit cost one
    30-90s remote compile PER SCAN on the tunneled v5e; measured 2.72x on
    cold mixed-depth eval in perf/probe_cold_eval.py)."""
    from ctseg_tpu.constants import NUM_CLASSES
    from ctseg_tpu.ops import squash_predictions
    from ctseg_tpu.transforms.windowing import soft_tissue_window

    window = trainer.config.volumetric_mode == "patch"
    cache = trainer.__dict__.setdefault("_swin_cache", {})
    key = (bucket_hwd, patch_size, overlap, batch_size, window)
    if key not in cache:
        runner = build_sliding_window_fn(
            trainer.model.apply, bucket_hwd, patch_size, overlap=overlap,
            batch_size=batch_size, out_channels=NUM_CLASSES,
            dynamic_starts=True,
        )

        @jax.jit
        def infer(params, img, starts):
            vol = jnp.moveaxis(img.astype(jnp.float32), 0, -1)
            if window:
                vol = soft_tissue_window(vol)
            else:
                vol = vol[..., None]
            return squash_predictions(runner(params, vol, starts))

        cache[key] = infer
    return cache[key]


def sliding_window_inference(
    volume: jnp.ndarray,
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    patch_size: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    mode: str = "gaussian",
    out_channels: Optional[int] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> jnp.ndarray:
    """Blend `apply_fn` logits over a window grid covering `volume`.

    volume: (*spatial, C_in). apply_fn: (N, *patch, C_in) -> (N, *patch, C_out).
    Returns (*spatial, C_out) blended logits. One-shot convenience API; for
    repeated volumes of the same shape use `build_sliding_window_fn` (this
    wrapper recompiles per call).
    """
    patch_size = tuple(int(p) for p in patch_size)
    ndim = len(patch_size)
    assert volume.ndim == ndim + 1, "volume must be (*spatial, C)"
    if out_channels is None:
        # Abstract probe: no device work, no extra 30-90s remote compile —
        # the channel count is a static property of the traced shapes.
        spec = jax.ShapeDtypeStruct(
            (1,) + patch_size + (volume.shape[-1],), volume.dtype
        )
        out_channels = jax.eval_shape(apply_fn, spec).shape[-1]
    run = build_sliding_window_fn(
        lambda _, patches: apply_fn(patches),
        volume.shape[:ndim], patch_size, overlap, batch_size, mode,
        out_channels, mesh,
    )
    return run(None, volume)
