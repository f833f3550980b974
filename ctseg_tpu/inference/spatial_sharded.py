"""Depth-sharded sliding-window inference with halo exchange over ICI.

The distributed component SURVEY.md §5.7/§7 calls for: the volume's leading
spatial axis (the CT slice axis) is sharded across the mesh, each device
blends only the windows whose start lies in its own slab, and the two
boundary regions are reconciled with `jax.lax.ppermute` halo exchanges:

  1. forward halo: each device receives the first (patch - step) rows of its
     right neighbor so windows starting near its slab end can be evaluated
     locally;
  2. backward halo: the accumulated logits/weights a device wrote into its
     halo (rows owned by the right neighbor) are ppermuted right and added
     into that neighbor's slab.

This shards BOTH the compute and the volume itself — the window-parallel
mode in sliding_window.py keeps the volume replicated. Useful when a volume
(or a batch of them) is too large for one chip's HBM, and as the pattern for
scaling whole-volume inference across a pod.

Constraints (checked): depth axis padded to n_devices * local_d with
local_d a multiple of the window step and local_d >= patch_depth.
"""

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctseg_tpu.inference.sliding_window import (
    blend_accumulate,
    compute_window_grid,
    gaussian_importance,
)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_spatial_sliding_window_fn(
    apply_fn: Callable,
    volume_shape: Sequence[int],
    patch_size: Sequence[int],
    mesh: Mesh,
    axis: str = "data",
    overlap: float = 0.5,
    batch_size: int = 4,
    out_channels: Optional[int] = None,
    dtype=jnp.float32,
) -> Callable:
    """Build a reusable jitted depth-sharded runner: (params, volume) ->
    blended logits (depth edge-padded internally; the caller crops to the
    true depth).

    `apply_fn(params, patches)` takes the model params explicitly so they
    stay jit ARGUMENTS (CLAUDE.md rule 2 — closing over them would bake
    ~26M weights into the HLO as constants and defeat the jit cache), and
    the compiled shard_map program is reusable across volumes of
    `volume_shape`.
    """
    patch_size = tuple(int(p) for p in patch_size)
    volume_shape = tuple(int(s) for s in volume_shape)
    ndim = len(patch_size)
    assert len(volume_shape) == ndim + 1, "volume must be (*spatial, C)"
    n = mesh.shape[axis]
    assert n > 1, "use build_sliding_window_fn for single-device meshes"

    pd = patch_size[0]
    step = max(1, int(pd * (1.0 - overlap)))
    d = volume_shape[0]

    # Slab size: multiple of the step, at least one full patch.
    local_d = _ceil_to(max(math.ceil(d / n), pd), step)
    d_pad = local_d * n
    halo = pd - step
    assert halo < local_d, "patch depth too large for this mesh size"

    if out_channels is None:
        raise ValueError(
            "out_channels is required by the builder (probe it once with "
            "jax.eval_shape on the caller side, where params are available)"
        )

    # Local window grid, identical on every device: depth starts are the
    # uniform multiples of `step` inside the slab; other axes use the
    # standard (flush-end) grid.
    depth_starts = np.arange(0, local_d, step, dtype=np.int32)
    rest_grid = compute_window_grid(
        volume_shape[1:ndim], patch_size[1:], overlap
    )  # (M, ndim-1)
    starts = np.array(
        [(dstart, *rest) for dstart in depth_starts for rest in rest_grid],
        dtype=np.int32,
    )
    importance = gaussian_importance(patch_size)

    axis_sharding = NamedSharding(mesh, P(axis))

    def shard_body(params, vol_local):
        # vol_local: (local_d, *rest, C)
        idx = jax.lax.axis_index(axis)
        if halo > 0:
            perm_fwd = [(i, (i - 1) % n) for i in range(n)]  # i sends to i-1
            right_halo = jax.lax.ppermute(vol_local[:halo], axis, perm_fwd)
            # The last device's "right neighbor" is the wrap-around to device
            # 0 — replace with edge replication of its own last row.
            edge = jnp.broadcast_to(vol_local[-1:], right_halo.shape)
            right_halo = jnp.where(idx == n - 1, edge, right_halo)
            ext = jnp.concatenate([vol_local, right_halo], axis=0)
        else:
            ext = vol_local

        acc, weight = blend_accumulate(
            ext, lambda patches: apply_fn(params, patches),
            starts, patch_size, importance, out_channels, batch_size,
        )

        if halo > 0:
            # Send the overflow (rows owned by the right neighbor) right.
            perm_bwd = [(i, (i + 1) % n) for i in range(n)]
            recv_acc = jax.lax.ppermute(acc[local_d:], axis, perm_bwd)
            recv_w = jax.lax.ppermute(weight[local_d:], axis, perm_bwd)
            # Device 0 "receives" the last device's overflow via wrap-around;
            # that belongs to padded rows — drop it.
            keep = (idx > 0).astype(acc.dtype)
            acc_final = acc[:local_d].at[:halo].add(recv_acc * keep)
            w_final = weight[:local_d].at[:halo].add(recv_w * keep)
        else:
            acc_final, w_final = acc, weight
        return acc_final / jnp.maximum(w_final, 1e-30)

    sharded = jax.jit(
        jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(axis)),  # params replicated, volume depth-sharded
            out_specs=P(axis),
        )
    )

    def run(params, volume):
        assert volume.shape == volume_shape, (volume.shape, volume_shape)
        # Edge-pad depth so windows near the true end see replicated (not
        # zero) values; the caller crops back to the true depth.
        pad_cfg = [(0, d_pad - d)] + [(0, 0)] * (volume.ndim - 1)
        volume_p = jnp.pad(volume, pad_cfg, mode="edge")
        volume_sharded = jax.device_put(volume_p, axis_sharding)
        return sharded(params, volume_sharded)[:d]

    return run


def sliding_window_inference_spatial(
    volume: jnp.ndarray,
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    patch_size: Sequence[int],
    mesh: Mesh,
    axis: str = "data",
    overlap: float = 0.5,
    batch_size: int = 4,
    out_channels: Optional[int] = None,
    params=None,
) -> jnp.ndarray:
    """Depth-sharded blended inference. volume: (D, *rest, C).

    One-shot convenience API (recompiles per call, like
    sliding_window_inference); for repeated volumes of one shape use
    `build_spatial_sliding_window_fn`. Pass `params` with
    `apply_fn(params, patches)` so the weights stay jit arguments; the
    legacy `apply_fn(patches)`-closing-over-weights form still works but
    bakes them into the program as constants (CLAUDE.md rule 2).
    """
    patch_size = tuple(int(p) for p in patch_size)
    ndim = len(patch_size)
    assert volume.ndim == ndim + 1, "volume must be (*spatial, C)"
    if params is None:
        apply2 = lambda _, patches: apply_fn(patches)  # noqa: E731
    else:
        apply2 = apply_fn
    n = mesh.shape[axis]
    if n == 1:
        from ctseg_tpu.inference.sliding_window import sliding_window_inference

        return sliding_window_inference(
            volume, lambda patches: apply2(params, patches),
            patch_size, overlap, batch_size, out_channels=out_channels,
        )
    if out_channels is None:
        # Abstract probe: no device work, no extra 30-90s remote compile —
        # the channel count is a static property of the traced shapes.
        spec = jax.ShapeDtypeStruct(
            (1,) + patch_size + (volume.shape[-1],), volume.dtype
        )
        out_channels = jax.eval_shape(
            lambda p: apply2(params, p), spec
        ).shape[-1]
    run = build_spatial_sliding_window_fn(
        apply2, volume.shape, patch_size, mesh, axis=axis, overlap=overlap,
        batch_size=batch_size, out_channels=out_channels, dtype=volume.dtype,
    )
    return run(params, volume)
