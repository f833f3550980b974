"""StableHLO inference export: roundtrip exactness and portability.

The exported artifact must (a) reproduce the production prediction path
bit-for-bit on the same platform, (b) accept any batch size through its
symbolic batch dim, (c) deserialize and run with NOTHING from ctseg_tpu
(pure jax), and (d) carry an inspectable sidecar. Contracts in
ctseg_tpu/inference/export.py; production path in inference/predict.py.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.inference.export import (
    export_checkpoint,
    export_patch_model,
    export_slice_model,
    load_exported,
    save_exported,
)
from ctseg_tpu.inference.predict import predict_labels_2d
from ctseg_tpu.training.trainer import TrainConfig, Trainer


@pytest.fixture(scope="module")
def trainer2d():
    cfg = TrainConfig(filters=(4, 8), num_res_units=1, input_size=32,
                      transform_degree=0)
    tr = Trainer(cfg)
    return tr, tr.init_state()


def test_slice_export_matches_predict(trainer2d, tmp_path):
    tr, state = trainer2d
    rng = np.random.default_rng(0)
    vol = rng.normal(40, 300, size=(5, 48, 48)).astype(np.float32)

    exported = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",))
    path = save_exported(exported, tmp_path / "m.stablehlo",
                         config=tr.config.as_dict())
    fn = load_exported(path)

    got = np.asarray(fn(jnp.asarray(vol)))
    want = predict_labels_2d(tr, state.params, vol, batch_size=5)
    assert got.dtype == np.uint8 and got.shape == (5, 48, 48)
    np.testing.assert_array_equal(got, want)


def test_export_drops_tpu_only_fusion_flags(tmp_path):
    """A checkpoint trained with the Pallas fusion / polyphase flags must
    export with them cloned OFF: their Mosaic custom calls cannot lower for
    the 'cpu' platform the artifact targets (all three are parameter-free
    drop-ins, so numerics are unchanged)."""
    from ctseg_tpu.inference.export import _model_for_dtype

    cfg = TrainConfig(filters=(4, 8), num_res_units=1, input_size=32,
                      transform_degree=0, fused_norm=True, fused_conv=True,
                      polyphase_up=True)
    tr = Trainer(cfg)
    state = tr.init_state()
    model = _model_for_dtype(tr, None)
    assert not model.fused_norm_act
    assert not model.fused_conv_block
    assert not model.polyphase_up
    # and the export itself round-trips for cpu
    rng = np.random.default_rng(0)
    vol = rng.normal(40, 300, size=(2, 48, 48)).astype(np.float32)
    exported = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",))
    fn = load_exported(save_exported(exported, tmp_path / "m.stablehlo"))
    got = np.asarray(fn(jnp.asarray(vol)))
    want = predict_labels_2d(tr, state.params, vol, batch_size=2)
    np.testing.assert_array_equal(got, want)


def test_tpu_only_export_keeps_fusion_flags():
    """--platforms tpu keeps the checkpoint's Pallas fusion flags in the
    artifact (the measured speedups survive); any non-tpu target forces
    them off — Mosaic custom calls lower only for TPU, so e.g.
    `--platforms tpu cuda` must drop them even though tpu is listed."""
    from ctseg_tpu.inference.export import _model_for_dtype

    cfg = TrainConfig(filters=(4, 8), num_res_units=1, input_size=32,
                      transform_degree=0, fused_norm=True, fused_conv=True,
                      polyphase_up=True)
    tr = Trainer(cfg)
    model = _model_for_dtype(tr, None, platforms=("tpu",))
    assert model.fused_norm_act == tr.model.fused_norm_act
    assert model.fused_conv_block
    assert model.polyphase_up
    # dtype override still applies without touching the fusion flags
    model_bf16 = _model_for_dtype(tr, "bfloat16", platforms=("tpu",))
    assert model_bf16.dtype == jnp.bfloat16
    assert model_bf16.fused_conv_block
    # Any non-tpu platform in the list clears the flags, not just 'cpu'
    # (pre-fix, --platforms cuda kept un-lowerable Mosaic calls).
    for platforms in (("tpu", "cuda"), ("cuda",), ("rocm", "tpu")):
        m = _model_for_dtype(tr, None, platforms=platforms)
        assert not m.fused_norm_act
        assert not m.fused_conv_block
        assert not m.polyphase_up


def test_symbolic_batch(trainer2d, tmp_path):
    tr, state = trainer2d
    exported = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",))
    fn = load_exported(save_exported(exported, tmp_path / "m.stablehlo"))
    for b in (1, 3, 7):
        out = fn(jnp.zeros((b, 48, 48), jnp.float32))
        assert out.shape == (b, 48, 48)


def test_loader_needs_only_jax(trainer2d, tmp_path):
    """Deserialize + run in a subprocess that cannot import ctseg_tpu."""
    tr, state = trainer2d
    exported = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",))
    path = save_exported(exported, tmp_path / "m.stablehlo")
    code = f"""
import sys
sys.modules["ctseg_tpu"] = None  # any import attempt raises
from pathlib import Path
import jax, jax.numpy as jnp
exported = jax.export.deserialize(Path({str(path)!r}).read_bytes())
out = jax.jit(exported.call)(jnp.zeros((2, 48, 48), jnp.float32))
assert out.shape == (2, 48, 48) and out.dtype == jnp.uint8, out
print("portable-ok")
"""
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "portable-ok" in r.stdout


def test_patch_export_matches_model(tmp_path):
    from ctseg_tpu.transforms.windowing import apply_window

    cfg = TrainConfig(filters=(4, 8), num_res_units=1, spatial_dims=3,
                      input_shape=(16, 16, 8), volumetric_mode="patch")
    tr = Trainer(cfg)
    state = tr.init_state()
    exported = export_patch_model(tr, state.params, patch_size=(16, 16, 8),
                                  platforms=("cpu",))
    fn = load_exported(save_exported(exported, tmp_path / "m3.stablehlo"))

    rng = np.random.default_rng(1)
    patches = rng.normal(40, 300, size=(2, 16, 16, 8)).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(patches)))
    want = np.asarray(tr.model.apply(
        state.params,
        apply_window(jnp.asarray(patches)[..., None], 350, 20, shift=True),
    ))
    assert got.shape == (2, 16, 16, 8, 10)
    # f32 compute on both sides; the export lowering may reassociate
    # reductions, so exactness is bitwise only per-platform-schedule.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_infer_dtype_override(trainer2d, tmp_path):
    """infer_dtype='bfloat16' bakes a bf16 compute path (params stay f32).

    The lowered module must carry bf16 convolutions, and the labels must
    agree with the bf16-cloned model except at bf16 argmax near-ties
    (random-init logits are nearly uniform, so exact equality across two
    different lowerings of the same bf16 graph is not a stable contract)."""
    import jax.numpy as jnp2

    tr, state = trainer2d
    exported = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",), infer_dtype="bfloat16")
    assert "bf16" in exported.mlir_module()
    f32_only = export_slice_model(tr, state.params, slice_shape=(48, 48),
                                  platforms=("cpu",))
    assert "bf16" not in f32_only.mlir_module()

    fn = load_exported(save_exported(exported, tmp_path / "bf16.stablehlo"))
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(40, 300, size=(3, 48, 48)), jnp.float32)
    got = np.asarray(fn(vol))

    model_bf16 = tr.model.clone(dtype=jnp2.bfloat16)
    key = jax.random.key(0)

    def one(img):
        out, _ = tr.test_transform(key, img, jnp.zeros(img.shape, jnp.int32))
        return out

    imgs = jax.vmap(one)(vol)
    logits = model_bf16.apply(state.params, imgs)
    assert logits.dtype == jnp2.bfloat16
    want = jax.image.resize(jnp.argmax(logits, -1), (3, 48, 48), "nearest")
    agreement = np.mean(got == np.asarray(want, np.uint8))
    assert agreement > 0.99, agreement


def test_export_cli_and_sidecar(trainer2d, tmp_path):
    tr, state = trainer2d
    ckpt = tmp_path / "ckpt"
    tr.save(ckpt, state)
    out = tmp_path / "cli.stablehlo"
    from ctseg_tpu.inference.export import main

    main(["--checkpoint", str(ckpt), "--out", str(out),
          "--slice_shape", "48", "48", "--platforms", "cpu"])
    assert out.exists()
    meta = json.loads(Path(str(out) + ".json").read_text())
    assert meta["platforms"] == ["cpu"]
    assert meta["config"]["filters"] == [4, 8]
    assert "b" in meta["in_avals"][0]  # symbolic batch recorded

    fn = load_exported(out)
    assert fn(jnp.zeros((2, 48, 48), jnp.float32)).shape == (2, 48, 48)
