"""Evaluation module: dataset-level Dice aggregation + 3D sliding-window."""

import numpy as np
import pytest

from ctseg_tpu.data.datasets import PackedDataset2D, PackedDataset3D
from ctseg_tpu.inference.evaluate import (
    evaluate_2d,
    evaluate_3d_sliding_window,
    format_table,
)
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d


def _packed2d(rng, n=16, hw=64):
    images = rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32)
    labels = rng.integers(0, 10, size=(n, hw, hw)).astype(np.uint8)
    ind = np.ones((n, 9), np.float32)
    return PackedDataset2D(images=images, labels=labels, indicators=ind)


def test_evaluate_2d(rng):
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng)
    result = evaluate_2d(tr, state.params, ds, batch_size=8)
    assert 0.0 <= result["mean_dice"] <= 1.0
    assert len(result["per_structure_dice"]) == 9
    assert result["num_slices"] == 16
    table = format_table(result)
    assert "Mean" in table and "BrainStem" in table


def test_evaluate_3d_sliding_window(rng):
    images = [rng.normal(40, 200, size=(20, 48, 48)).astype(np.float32)
              for _ in range(2)]
    labels = [rng.integers(0, 10, size=(20, 48, 48)).astype(np.uint8)
              for _ in range(2)]
    inds = [np.ones(9, np.float32)] * 2
    ds = PackedDataset3D(images, labels, inds)

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("Focal", "Dice"), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    result = evaluate_3d_sliding_window(
        tr, state.params, ds, patch_size=(32, 32, 16), batch_size=2,
        with_hd95=True,
    )
    assert result["num_volumes"] == 2
    assert 0.0 <= result["mean_dice"] <= 1.0
    assert result["vols_per_min"] > 0
    assert len(result["per_structure_hd95"]) == 9
    # no spacing on the dataset -> voxel units, labeled in the table
    assert result["hd95_unit"] == "voxel"
    assert "HD95(vox)" in format_table(result)


def test_evaluate_3d_hd95_in_millimetres(rng):
    """A dataset with per-patient voxel spacing reports HD95 in mm: unit
    labeled, and values consistent with scaling the geometry (an isotropic
    spacing of s scales every surface distance by exactly s)."""
    images = [rng.normal(40, 200, size=(12, 32, 32)).astype(np.float32)
              for _ in range(2)]
    labels = [rng.integers(0, 10, size=(12, 32, 32)).astype(np.uint8)
              for _ in range(2)]
    inds = [np.ones(9, np.float32)] * 2
    ds_unit = PackedDataset3D(images, labels, inds)
    ds_mm = PackedDataset3D(
        images, labels, inds,
        spacings=[np.full(3, 2.5, np.float32)] * 2,
    )

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("CrossEntropy",), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    kw = dict(patch_size=(32, 32, 16), batch_size=2, with_hd95=True)
    r_unit = evaluate_3d_sliding_window(tr, state.params, ds_unit, **kw)
    r_mm = evaluate_3d_sliding_window(tr, state.params, ds_mm, **kw)
    assert r_unit["hd95_unit"] == "voxel"
    assert r_mm["hd95_unit"] == "mm"
    assert "HD95(mm)" in format_table(r_mm)
    for s, v in r_mm["per_structure_hd95"].items():
        u = r_unit["per_structure_hd95"][s]
        if v is None or u is None:
            assert v is None and u is None
            continue
        np.testing.assert_allclose(v, 2.5 * u, rtol=1e-4, atol=1e-4)


def test_evaluate_2d_hd95_in_millimetres(rng):
    """A packed 2D split with per-slice in-plane spacing reports HD95 in
    mm, scaled to the model grid: with raw 64px slices evaluated at
    input_size 32 and isotropic 2.5 mm header spacing, every surface
    distance is exactly 2.5 * (64/32) = 5 mm per model-grid voxel."""
    n, hw = 10, 64
    images = rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32)
    labels = rng.integers(0, 10, size=(n, hw, hw)).astype(np.uint8)
    ind = np.ones((n, 9), np.float32)
    ds_unit = PackedDataset2D(images=images, labels=labels, indicators=ind)
    ds_mm = PackedDataset2D(
        images=images, labels=labels, indicators=ind,
        spacings=np.full((n, 2), 2.5, np.float32),
    )
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    r_unit = evaluate_2d(tr, state.params, ds_unit, batch_size=4,
                         with_hd95=True)
    r_mm = evaluate_2d(tr, state.params, ds_mm, batch_size=4,
                       with_hd95=True)
    assert r_unit["hd95_unit"] == "voxel"
    assert r_mm["hd95_unit"] == "mm"
    assert "HD95(mm)" in format_table(r_mm)
    for s, v in r_mm["per_structure_hd95"].items():
        u = r_unit["per_structure_hd95"][s]
        if v is None or u is None:
            assert v is None and u is None
            continue
        np.testing.assert_allclose(v, 5.0 * u, rtol=1e-4, atol=1e-4)


def test_evaluate_2d_hd95_matches_scipy_oracle(rng):
    """End-to-end differential: evaluate_2d's mm HD95 with ANISOTROPIC
    in-plane spacing equals recomputing the model's own predictions on the
    host and running the scipy oracle with sampling=model-grid spacing,
    nan-aggregated per class over slices (reference semantics)."""
    import jax
    import jax.numpy as jnp

    from ctseg_tpu.metrics.hd95 import hd95_per_structure
    from ctseg_tpu.ops import squash_predictions
    from ctseg_tpu.transforms.pipelines import batched_transform

    n, hw, model_hw = 6, 48, 32
    images = rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32)
    labels = rng.integers(0, 10, size=(n, hw, hw)).astype(np.uint8)
    ind = np.ones((n, 9), np.float32)
    spacing_raw = np.tile(
        np.asarray([1.1, 0.7], np.float32), (n, 1)
    )  # anisotropic rows vs cols
    ds = PackedDataset2D(
        images=images, labels=labels, indicators=ind, spacings=spacing_raw
    )
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=3, transform_degree=1,
        input_size=model_hw,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    result = evaluate_2d(tr, state.params, ds, batch_size=3, with_hd95=True)
    assert result["hd95_unit"] == "mm"

    # Host oracle: same transform, same forward, scipy EDT with sampling=.
    imgs_t, labs_t = batched_transform(
        tr.test_transform, jax.random.key(0), jnp.asarray(images),
        jnp.asarray(labels.astype(np.int32)),
    )
    preds = np.asarray(
        squash_predictions(tr.model.apply(state.params, imgs_t))
    )
    labs_t = np.asarray(labs_t)
    scale = hw / model_hw
    per_slice = np.stack([
        hd95_per_structure(
            preds[i], labs_t[i], n_classes=10,
            spacing=spacing_raw[i] * scale,
        )
        for i in range(n)
    ])  # (n, 9) with nan where either mask empty
    with np.errstate(invalid="ignore"):
        expected = np.nanmean(per_slice, axis=0)
    for k, s in enumerate(result["per_structure_hd95"]):
        v = result["per_structure_hd95"][s]
        if np.isnan(expected[k]):
            assert v is None
        else:
            np.testing.assert_allclose(v, expected[k], rtol=1e-4, atol=1e-4)


def test_evaluate_3d_sliding_window_mesh_matches_single(rng):
    """The grouped lax.map evaluation gives the same Dice with and without
    a device mesh (windows sharded over 'data'; the --n_devices CLI path)."""
    from ctseg_tpu.parallel import make_mesh

    images = [rng.normal(40, 200, size=(18, 40, 40)).astype(np.float32)
              for _ in range(2)]
    labels = [rng.integers(0, 10, size=(18, 40, 40)).astype(np.uint8)
              for _ in range(2)]
    ds = PackedDataset3D(images, labels, [np.ones(9, np.float32)] * 2)

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("CrossEntropy",), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    kw = dict(patch_size=(32, 32, 16), batch_size=8)
    r1 = evaluate_3d_sliding_window(tr, state.params, ds, **kw)
    r8 = evaluate_3d_sliding_window(
        tr, state.params, ds, mesh=make_mesh(8), **kw
    )
    np.testing.assert_allclose(
        [r1["per_structure_dice"][s] for s in r1["per_structure_dice"]],
        [r8["per_structure_dice"][s] for s in r8["per_structure_dice"]],
        rtol=1e-5, atol=1e-6,
    )


def test_evaluate_3d_heterogeneous_depths_one_program(rng, monkeypatch):
    """Mixed-depth volumes (the real PDDCA case: every patient a different
    slice count) share ONE compiled sliding-window program via grid
    bucketing + traced window starts, and the result matches the
    per-volume unbucketed oracle exactly (clamped grids are identical, the
    bucket pad has zero blend weight and is masked out of the metrics).
    Also exercises the partial-chunk padding path (GROUP_CHUNK=2, 3 vols).
    """
    import jax.numpy as jnp

    import ctseg_tpu.inference.evaluate as ev
    from ctseg_tpu.inference.sliding_window import build_sliding_window_fn
    from ctseg_tpu.metrics import dice_per_sample_class, masked_mean_batch
    from ctseg_tpu.ops import squash_predictions
    from ctseg_tpu.transforms.windowing import apply_window

    monkeypatch.setattr(ev, "GROUP_CHUNK", 2)

    depths = (17, 20, 23)  # all bucket to 24 with patch_d 16, overlap 0.5
    images = [rng.normal(40, 200, size=(d, 40, 40)).astype(np.float32)
              for d in depths]
    labels = [rng.integers(0, 10, size=(d, 40, 40)).astype(np.uint8)
              for d in depths]
    ds = PackedDataset3D(images, labels, [np.ones(9, np.float32)] * 3)

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("CrossEntropy",), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    patch = (32, 32, 16)

    result = ev.evaluate_3d_sliding_window(
        tr, state.params, ds, patch_size=patch, batch_size=2, with_hd95=True,
    )
    assert result["compiled_programs"] == 1
    assert result["num_volumes"] == 3

    # Oracle: the pre-bucketing semantics — one static-grid runner per true
    # shape, post-window zero padding up to the patch, exact slicing. HD95
    # is oracled too: the bucket pad must not create phantom surface voxels
    # (a true-extent boundary voxel is a surface voxel either way, because
    # surface extraction uses border_value=0 — pad-zeros and the volume
    # edge are indistinguishable to it).
    from ctseg_tpu.metrics.hd95 import hd95_per_structure_device

    rows, valids, hd_rows, hd_valids = [], [], [], []
    for img, lab in zip(images, labels):
        d, h, w = img.shape
        hp = tuple(max(s, p) for s, p in zip((h, w, d), patch))
        run = build_sliding_window_fn(
            tr.model.apply, hp, patch, overlap=0.5, batch_size=2,
            out_channels=10,
        )
        vol = jnp.moveaxis(jnp.asarray(img, jnp.float32), 0, -1)[..., None]
        vol = apply_window(vol, 350, 20, shift=True)
        pads = [(0, p - s) for s, p in zip(vol.shape[:3], hp)] + [(0, 0)]
        logits = run(state.params, jnp.pad(vol, pads))[:h, :w, :d]
        preds = squash_predictions(logits)
        target = jnp.moveaxis(jnp.asarray(lab, jnp.int32), 0, -1)
        dice, valid = dice_per_sample_class(preds[None], target[None])
        rows.append(dice[0])
        valids.append(valid[0])
        hd, hd_ok = hd95_per_structure_device(preds, target, 10)
        hd_rows.append(hd)
        hd_valids.append(hd_ok)
    per_class, _ = masked_mean_batch(jnp.stack(rows), jnp.stack(valids))
    from ctseg_tpu.constants import STRUCTURES

    np.testing.assert_allclose(
        [result["per_structure_dice"][s] for s in STRUCTURES],
        np.asarray(per_class), rtol=1e-6, atol=1e-7,
    )
    hd_mean, hd_n = masked_mean_batch(jnp.stack(hd_rows), jnp.stack(hd_valids))
    hd_mean, hd_n = np.asarray(hd_mean), np.asarray(hd_n)
    assert result["hd95_unit"] == "voxel"
    for s, v, n in zip(STRUCTURES, hd_mean, hd_n):
        got = result["per_structure_hd95"][s]
        if n == 0:
            assert got is None
        else:
            np.testing.assert_allclose(got, float(v), rtol=1e-6, atol=1e-7)


def test_sliding_window_throughput(rng):
    from ctseg_tpu.inference.evaluate import sliding_window_throughput

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=1, transform_degree=0,
        loss_fx=("CrossEntropy",), spatial_dims=3, input_shape=(16, 16, 16),
        in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch", patch_size=(16, 16, 16))
    state = tr.init_state()
    ds = PackedDataset3D(
        images=rng.normal(40, 200, size=(2, 10, 24, 24)).astype(np.float32),
        labels=rng.integers(0, 10, size=(2, 10, 24, 24)).astype(np.uint8),
        indicators=np.ones((2, 9), np.float32),
    )
    r = sliding_window_throughput(
        tr, state.params, ds, patch_size=(16, 16, 16), reps=1
    )
    assert r["vols_per_min"] > 0 and r["num_volumes"] == 2
    assert r["compiled_programs"] == 1
    # The timed runner is the SAME cached program predict/serve use
    # (sliding_window.bucketed_swin_runner on trainer._swin_cache): a warm
    # serving trainer re-times without recompiling.
    assert len(tr._swin_cache) == 1

    # Mixed depths in one grid bucket also share a single runner.
    ds_mixed = PackedDataset3D(
        images=[rng.normal(40, 200, size=(d, 24, 24)).astype(np.float32)
                for d in (18, 20, 22)],
        labels=[rng.integers(0, 10, size=(d, 24, 24)).astype(np.uint8)
                for d in (18, 20, 22)],
        indicators=[np.ones(9, np.float32)] * 3,
    )
    r2 = sliding_window_throughput(
        tr, state.params, ds_mixed, patch_size=(16, 16, 16), reps=1
    )
    assert r2["num_volumes"] == 3 and r2["compiled_programs"] == 1


def test_presets():
    from ctseg_tpu.models.presets import MODEL_3D, MODEL_L, MODEL_M, PRESETS

    assert MODEL_L.num_res_units == 2 and MODEL_L.loss_fx == ("Focal", "Dice")
    assert MODEL_M.num_res_units == 1 and MODEL_M.mixup
    assert "Boundary" in MODEL_M.loss_fx
    assert MODEL_3D.spatial_dims == 3
    assert set(PRESETS) == {"model_l", "model_m", "model_3d"}


def test_examples_callback(tmp_path, rng):
    from ctseg_tpu.training.callbacks import ExamplesLoggingCallback

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=6)
    cb = ExamplesLoggingCallback(ds, tmp_path, every_n_epochs=2, max_examples=3)
    cb(tr, state, epoch=0)  # epoch 1: not a multiple of 2
    assert not any(tmp_path.iterdir())
    cb(tr, state, epoch=1)  # epoch 2: fires
    out = tmp_path / "epoch_0002"
    assert out.is_dir()
    assert len(list(out.glob("*.npy"))) == 3


def test_examples_callback_exclude_missing_zeroes_logits(tmp_path, rng):
    """With exclude_missing, a structure absent from the annotation is zeroed
    in the displayed prediction (capstone/training/callbacks.py:70-75)."""
    from ctseg_tpu.training.callbacks import ExamplesLoggingCallback

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=4, transform_degree=1,
        input_size=32, exclude_missing=True,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=4)
    ds.indicators[:] = 0.0  # every structure missing from every annotation

    cb = ExamplesLoggingCallback(ds, tmp_path, every_n_epochs=1, max_examples=4)
    cb(tr, state, epoch=0)

    # Reproduce the callback's forward (deterministic) and assert the panel
    # shows the zeroed-logit squash, not the raw argmax.
    import jax
    import jax.numpy as jnp

    import ctseg_tpu.ops as ops
    from ctseg_tpu.transforms.pipelines import batched_transform

    images = jnp.asarray(ds.images[cb.indices], jnp.float32)
    labels = jnp.asarray(ds.labels[cb.indices], jnp.int32)
    img_t, _ = batched_transform(
        tr.test_transform, jax.random.key(0), images, labels
    )
    logits = tr.model.apply(state.params, img_t)
    zeroed = jnp.concatenate(
        [logits[..., :1], jnp.zeros_like(logits[..., 1:])], axis=-1
    )
    expected = np.asarray(ops.squash_predictions(zeroed))
    for j, name in enumerate(np.asarray(ds.names)[cb.indices]):
        panel = np.load(tmp_path / "epoch_0001" / f"{name}.npy")
        h = panel.shape[0]
        pred_overlay = panel[:, h : 2 * h]
        base = panel[:, :h]
        # Pixels where prediction == background show the raw grayscale base.
        bg = expected[j] == 0
        np.testing.assert_allclose(pred_overlay[bg], base[bg], atol=1e-6)


def test_padded_epoch_covers_every_sample(rng):
    """padded_epoch yields every index exactly once + a correct valid mask."""
    from ctseg_tpu.data.pipeline import DevicePipeline2D

    ds = _packed2d(rng, n=13, hw=16)
    pipe = DevicePipeline2D(ds, batch_size=5)
    seen = []
    n_batches = 0
    for imgs, labs, inds, valid in pipe.padded_epoch(None):
        assert imgs.shape[0] == 5 and valid.shape == (5,)
        seen.append(np.asarray(valid))
        n_batches += 1
    assert n_batches == 3  # ceil(13 / 5)
    assert int(np.concatenate(seen).sum()) == 13


def test_evaluate_2d_full_coverage(rng):
    """Regression for the round-1 bug: 17% of the test split was dropped when
    the batch size did not divide it. num_slices must equal len(dataset) and
    the Dice table must be identical to a single full-split batch."""
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=13, hw=16)

    res_padded = evaluate_2d(tr, state.params, ds, batch_size=8)
    assert res_padded["num_slices"] == 13

    res_full = evaluate_2d(tr, state.params, ds, batch_size=13)
    assert res_full["num_slices"] == 13
    np.testing.assert_allclose(
        [res_padded["per_structure_dice"][s] for s in res_padded["per_structure_dice"]],
        [res_full["per_structure_dice"][s] for s in res_full["per_structure_dice"]],
        rtol=1e-5,
        atol=1e-7,
    )


def test_eval_epoch_full_coverage(rng):
    """trainer.eval_epoch (the CLI test path) also evaluates every sample:
    sample-mean losses are identical whatever the batch size."""
    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=13, hw=16)

    from ctseg_tpu.data.pipeline import DevicePipeline2D

    m_padded = tr.eval_epoch(state.params, DevicePipeline2D(ds, 5), "t")
    m_full = tr.eval_epoch(state.params, DevicePipeline2D(ds, 13), "t")
    # Focal and Dice are per-sample means, so the sample-weighted batch
    # aggregation must reproduce the single-batch value exactly.
    for k in ("t/loss/Focal", "t/loss/Dice"):
        assert m_padded[k] == pytest.approx(m_full[k], rel=1e-5)


def test_evaluate_2d_mesh_matches_single_device(rng):
    """Data-parallel evaluation over the 8-device mesh == single-device."""
    from ctseg_tpu.parallel import make_mesh

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = _packed2d(rng, n=19, hw=16)  # 19: exercises padding + mesh rounding

    single = evaluate_2d(tr, state.params, ds, batch_size=8)
    mesh = make_mesh(8)
    meshed = evaluate_2d(tr, state.params, ds, batch_size=8, mesh=mesh)
    assert meshed["num_slices"] == single["num_slices"] == 19
    np.testing.assert_allclose(
        [meshed["per_structure_dice"][s] for s in meshed["per_structure_dice"]],
        [single["per_structure_dice"][s] for s in single["per_structure_dice"]],
        rtol=1e-5, atol=1e-7,
    )


def test_empty_datasets_raise_clear_errors(rng):
    """ADVICE r2: empty splits must fail with ValueError, not NameError/
    IndexError deep in the staging loop."""
    from ctseg_tpu.inference.evaluate import sliding_window_throughput

    cfg = TrainConfig(
        filters=(4, 8, 16, 32, 64), batch_size=8, transform_degree=1,
        input_size=32,
    )
    tr = Trainer(cfg)
    state = tr.init_state()
    empty2d = PackedDataset2D(
        images=np.zeros((0, 32, 32), np.float32),
        labels=np.zeros((0, 32, 32), np.uint8),
        indicators=np.zeros((0, 9), np.float32),
    )
    with pytest.raises(ValueError, match="empty"):
        evaluate_2d(tr, state.params, empty2d)

    cfg3 = TrainConfig(
        filters=(2, 4, 8, 16, 32), batch_size=1, loss_fx=("CrossEntropy",),
        spatial_dims=3, input_shape=(32, 32, 16), in_channels=1,
    )
    tr3 = make_trainer_3d(cfg3, mode="patch", patch_size=(32, 32, 16))
    s3 = tr3.init_state()
    empty3d = PackedDataset3D([], [], [])
    with pytest.raises(ValueError, match="empty"):
        evaluate_3d_sliding_window(
            tr3, s3.params, empty3d, patch_size=(32, 32, 16)
        )
    with pytest.raises(ValueError, match="empty"):
        sliding_window_throughput(
            tr3, s3.params, empty3d, patch_size=(32, 32, 16)
        )


class _StubModel2D:
    """Logits favor class 5 (logit 5.0) over class 3 (logit 3.0) everywhere."""

    def apply(self, params, imgs):
        n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        logits = np.zeros((n, h, w, 10), np.float32)
        logits[..., 5] = 5.0
        logits[..., 3] = 3.0
        import jax.numpy as jnp

        return jnp.asarray(logits)


def test_evaluate_2d_exclude_missing_masks_logits(rng):
    """With exclude_missing, a structure absent from a sample's annotations
    cannot win the argmax (mirrors the trainer's eval step; previously
    evaluate_2d ignored the indicators entirely)."""
    from types import SimpleNamespace

    n, hw = 4, 16
    images = rng.normal(40, 200, size=(n, hw, hw)).astype(np.float32)
    labels = np.full((n, hw, hw), 3, np.uint8)  # GT: class 3 everywhere
    ind = np.ones((n, 9), np.float32)
    ind[:, 4] = 0.0  # class 5 (index 4 of structures 1..9) missing
    ds = PackedDataset2D(images=images, labels=labels, indicators=ind)

    stub = SimpleNamespace(
        config=SimpleNamespace(exclude_missing=True),
        model=_StubModel2D(),
        test_transform=lambda key, im, lab: (im[..., None], lab),
    )
    result = evaluate_2d(stub, None, ds, batch_size=4)
    # Masked: class-5 logits zeroed -> argmax falls to class 3 (Mandible)
    # -> Dice 1.0.
    assert result["per_structure_dice"]["Mandible"] == pytest.approx(1.0)

    stub.config.exclude_missing = False
    result_unmasked = evaluate_2d(stub, None, ds, batch_size=4)
    # Unmasked: everything predicted class 5 -> class-3 Dice 0.
    assert result_unmasked["per_structure_dice"]["Mandible"] == pytest.approx(0.0)


def test_evaluate_3d_exclude_missing_masks_logits(rng):
    from types import SimpleNamespace

    import jax.numpy as jnp

    class _StubModel3D:
        def apply(self, params, patches):
            shp = patches.shape[:-1] + (10,)
            logits = jnp.zeros(shp, jnp.float32)
            logits = logits.at[..., 5].set(5.0).at[..., 3].set(3.0)
            return logits

    images = [rng.normal(40, 200, size=(16, 32, 32)).astype(np.float32)]
    labels = [np.full((16, 32, 32), 3, np.uint8)]
    ind = np.ones(9, np.float32)
    ind[4] = 0.0
    ds = PackedDataset3D(images, labels, [ind])

    stub = SimpleNamespace(
        config=SimpleNamespace(exclude_missing=True),
        model=_StubModel3D(),
    )
    result = evaluate_3d_sliding_window(
        stub, None, ds, patch_size=(32, 32, 16), batch_size=2, window=False
    )
    assert result["per_structure_dice"]["Mandible"] == pytest.approx(1.0)


def test_evaluate_3d_int16_hu_matches_float32(rng):
    """Integer-HU packed volumes (PDDCA NRRDs are int16; pack_volumes now
    preserves the dtype to halve upload bytes) evaluate BIT-EXACTLY like
    the float32 cast of the same data: every jitted consumer casts to
    float32 on device and int16 -> float32 is exact."""
    hu = rng.integers(-1024, 2000, size=(2, 14, 40, 40)).astype(np.int16)
    labels = [rng.integers(0, 10, size=(14, 40, 40)).astype(np.uint8)
              for _ in range(2)]
    inds = [np.ones(9, np.float32)] * 2
    spac = [np.array([3.0, 1.1, 1.1], np.float32)] * 2
    ds_i16 = PackedDataset3D(list(hu), labels, inds, spacings=spac)
    ds_f32 = PackedDataset3D(
        [v.astype(np.float32) for v in hu], labels, inds, spacings=spac
    )

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32), num_res_units=1, batch_size=2,
        loss_fx=("CrossEntropy",), spatial_dims=3,
        input_shape=(32, 32, 16), in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    kw = dict(patch_size=(32, 32, 16), batch_size=2, with_hd95=True)
    r_i = evaluate_3d_sliding_window(tr, state.params, ds_i16, **kw)
    r_f = evaluate_3d_sliding_window(tr, state.params, ds_f32, **kw)
    assert r_i["mean_dice"] == r_f["mean_dice"]
    assert r_i["per_structure_dice"] == r_f["per_structure_dice"]
    assert r_i["per_structure_hd95"] == r_f["per_structure_hd95"]
