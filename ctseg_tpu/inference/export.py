"""Portable inference export: checkpoint -> self-contained StableHLO artifact.

Deployment counterpart of the serving daemon (inference/serve.py). The
reference has no deployment story at all — its models exist only as
Lightning checkpoints that require the full training codebase to run
(capstone/interpretability.py:28-31). Here a trained checkpoint exports to
one serialized `jax.export` artifact that:

  - bakes the weights in as constants (one file = graph + weights +
    preprocessing; nothing from ctseg_tpu is needed to run it);
  - includes the full numeric contract: CT windowing + resize + normalize
    for 2D slice models (exactly the checkpoint's own test transform), or
    CT windowing for 3D patch scorers;
  - has a symbolic batch dimension (any batch size at call time);
  - is lowered for BOTH cpu and tpu by default, so the same artifact runs
    on a TPU server and a CPU fallback box;
  - round-trips through `jax.export.serialize/deserialize`, which is
    versioned and stable across jax releases (calling-convention version
    recorded in the sidecar JSON).

Exported contracts:
  2D slice model:  f(slices: f32[b, H, W] raw HU) -> u8[b, H, W] labels
  3D patch model:  f(patches: f32[b, ph, pw, pd] raw HU) -> f32[b, ..., 10]
                   logits (sliding-window extraction/blending is the
                   caller's orchestration; ctseg_tpu's own runner is in
                   inference/sliding_window.py)

Usage:
  python -m ctseg_tpu.inference.export --checkpoint storage/model_large \\
      --out model_large.stablehlo --slice_shape 280 280
  # then, anywhere with jax (no ctseg_tpu needed):
  #   exported = jax.export.deserialize(Path("model_large.stablehlo").read_bytes())
  #   labels = jax.jit(exported.call)(slices)
"""

import json
from argparse import ArgumentParser
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import NUM_CLASSES
from ctseg_tpu.ops import squash_predictions
from ctseg_tpu.training.trainer import Trainer

DEFAULT_PLATFORMS = ("cpu", "tpu")


def _model_for_dtype(
    trainer: Trainer,
    infer_dtype: Optional[str],
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
):
    """The trainer's model, optionally recast to an inference compute dtype.

    Params stay float32 (param_dtype is untouched); flax casts activations
    per layer, exactly like training with --bf16. Measured on v5e: the
    Model L artifact runs 483 ms/batch-32 exported at float32 vs 11.7 ms at
    bfloat16 (41x) — an f32-trained checkpoint should usually be exported
    with infer_dtype='bfloat16' for TPU serving.

    The Pallas fusion / polyphase flags are cloned OFF unless EVERY target
    platform is tpu: their TPU Mosaic custom calls cannot lower for any
    other backend, and all three are parameter-free drop-ins for the plain
    XLA path (checkpoint-compatible by design), so the exported numerics
    are unchanged. A TPU-only export (--platforms tpu) keeps the
    checkpoint's fusion flags, preserving the measured Pallas speedups in
    the artifact.
    """
    overrides = {}
    if any(p != "tpu" for p in platforms):
        overrides.update(fused_norm_act=False, fused_conv_block=False,
                         polyphase_up=False)
    if infer_dtype not in (None, "checkpoint"):
        overrides["dtype"] = (
            jnp.bfloat16 if infer_dtype == "bfloat16" else jnp.float32
        )
    return trainer.model.clone(**overrides) if overrides else trainer.model


def export_slice_model(
    trainer: Trainer,
    params,
    slice_shape: Tuple[int, int] = (280, 280),
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    infer_dtype: Optional[str] = None,
) -> "jax.export.Exported":
    """Export a 2D checkpoint as f(f32[b, H, W] raw HU) -> u8[b, H, W].

    The artifact applies the checkpoint's own test transform (windowing +
    resize to the trained input_size + normalize), runs the model, and
    nearest-upsamples predictions back to the native (H, W) — the same
    per-chunk math as predict.predict_labels_2d, minus the host batching.
    """
    if trainer.config.spatial_dims != 2:
        raise ValueError("export_slice_model needs a 2D checkpoint")
    h, w = slice_shape
    key = jax.random.key(0)  # test transform is deterministic
    model = _model_for_dtype(trainer, infer_dtype, platforms)

    def infer(slices):
        def one(img):
            out, _ = trainer.test_transform(key, img, jnp.zeros(img.shape, jnp.int32))
            return out

        imgs = jax.vmap(one)(slices)
        preds = squash_predictions(model.apply(params, imgs))
        preds = jax.image.resize(preds, (preds.shape[0], h, w), "nearest")
        return preds.astype(jnp.uint8)

    (b,) = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    return jax.export.export(jax.jit(infer), platforms=tuple(platforms))(spec)


def export_patch_model(
    trainer: Trainer,
    params,
    patch_size: Tuple[int, int, int] = (128, 128, 48),
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    infer_dtype: Optional[str] = None,
) -> "jax.export.Exported":
    """Export a 3D checkpoint as f(f32[b, ph, pw, pd] raw HU) -> logits.

    Windowing (350/20, shifted — transforms/windowing.py) is baked in, so
    callers hand raw HU patches; blending weights and patch extraction stay
    with the caller's sliding-window orchestration.
    """
    if trainer.config.spatial_dims != 3:
        raise ValueError("export_patch_model needs a 3D checkpoint")
    from ctseg_tpu.transforms.windowing import apply_window

    ph, pw, pd = patch_size
    model = _model_for_dtype(trainer, infer_dtype, platforms)

    def infer(patches):
        vol = apply_window(patches[..., None].astype(jnp.float32), 350, 20, shift=True)
        return model.apply(params, vol)

    (b,) = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, ph, pw, pd), jnp.float32)
    return jax.export.export(jax.jit(infer), platforms=tuple(platforms))(spec)


def save_exported(exported: "jax.export.Exported", path, config=None) -> Path:
    """Serialize to `path` + a human-readable sidecar `<path>.json`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exported.serialize())
    meta = {
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "config": dict(config) if config else None,
    }
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=1))
    return path


def load_exported(path):
    """Deserialize an artifact -> jitted callable (pure jax, no ctseg_tpu)."""
    exported = jax.export.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)


def export_checkpoint(
    checkpoint: str,
    out: str,
    slice_shape: Tuple[int, int] = (280, 280),
    patch_size: Tuple[int, int, int] = (128, 128, 48),
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    infer_dtype: Optional[str] = None,
) -> Path:
    """Restore `checkpoint`, export its inference fn (2D/3D auto), save."""
    trainer, state = Trainer.restore(checkpoint)
    if trainer.config.spatial_dims == 3:
        exported = export_patch_model(
            trainer, state.params, patch_size=patch_size, platforms=platforms,
            infer_dtype=infer_dtype,
        )
    else:
        exported = export_slice_model(
            trainer, state.params, slice_shape=slice_shape, platforms=platforms,
            infer_dtype=infer_dtype,
        )
    config = dict(trainer.config.as_dict(), _exported_infer_dtype=infer_dtype)
    return save_exported(exported, out, config=config)


def main(argv: Optional[Sequence[str]] = None):
    parser = ArgumentParser(description="Export a checkpoint to StableHLO")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True, help="artifact path (.stablehlo)")
    parser.add_argument(
        "--slice_shape", type=int, nargs=2, default=(280, 280),
        metavar=("H", "W"), help="native slice shape baked into a 2D export",
    )
    parser.add_argument("--patch_size", type=int, nargs=3,
                        default=(128, 128, 48), help="3D checkpoints only")
    parser.add_argument(
        "--platforms", nargs="+", default=list(DEFAULT_PLATFORMS),
        help="lowering targets (default: cpu tpu)",
    )
    parser.add_argument(
        "--infer_dtype", choices=("checkpoint", "float32", "bfloat16"),
        default="checkpoint",
        help="activation compute dtype baked into the artifact; bfloat16 is "
        "41x faster on v5e than a float32 export of Model L (measured)",
    )
    args = parser.parse_args(argv)
    path = export_checkpoint(
        args.checkpoint, args.out, slice_shape=tuple(args.slice_shape),
        patch_size=tuple(args.patch_size), platforms=tuple(args.platforms),
        infer_dtype=None if args.infer_dtype == "checkpoint" else args.infer_dtype,
    )
    print(f"wrote {path} (+{path}.json)")


if __name__ == "__main__":
    main()
