"""End-to-end smokes: synthetic NRRD -> convert -> pack -> train -> eval ->
checkpoint round trip, plus DP-equivalence across mesh sizes, plus the 3D
paths. This is the framework-level integration test the reference never had
(SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from ctseg_tpu.data.datasets import PackedDataset2D, PackedDataset3D
from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.parallel import make_mesh
from ctseg_tpu.training.trainer import TrainConfig, Trainer


def _synthetic_packed_2d(rng, n=48, hw=64):
    images = (rng.normal(40, 200, size=(n, hw, hw))).astype(np.float32)
    labels = np.zeros((n, hw, hw), np.uint8)
    for i in range(n):
        c = rng.integers(1, 10)
        y, x = rng.integers(8, hw - 24, size=2)
        labels[i, y : y + 16, x : x + 16] = c
        images[i, y : y + 16, x : x + 16] += 150  # signal correlates with mask
    indicators = np.zeros((n, 9), np.float32)
    for i in range(n):
        present = np.unique(labels[i])
        for c in present[present > 0]:
            indicators[i, c - 1] = 1
    return PackedDataset2D(images=images, labels=labels, indicators=indicators)


@pytest.fixture(scope="module")
def packed2d():
    return _synthetic_packed_2d(np.random.default_rng(7))


def _small_config(**kw):
    base = dict(
        filters=(4, 8, 16, 32, 64),
        num_res_units=1,
        batch_size=8,
        transform_degree=1,
        loss_fx=("Focal", "Dice"),
        lr=3e-3,
        input_size=32,
        epochs=2,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_loss_decreases(packed2d):
    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(packed2d, cfg.batch_size)
    first = last = None
    for i, batch in enumerate(pipe.epoch(jax.random.key(0))):
        state, metrics = tr._train_step(state, batch, jax.random.key(1))
        if first is None:
            first = float(metrics["loss/total"])
        last = float(metrics["loss/total"])
    # run one more epoch to give it slack
    for batch in pipe.epoch(jax.random.key(2)):
        state, metrics = tr._train_step(state, batch, jax.random.key(3))
        last = float(metrics["loss/total"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_mixup_and_exclude_missing_step(packed2d):
    cfg = _small_config(mixup=True, exclude_missing=True, transform_degree=2)
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(packed2d, cfg.batch_size)
    batch = next(pipe.epoch(jax.random.key(0)))
    state, metrics = tr._train_step(state, batch, jax.random.key(1))
    assert np.isfinite(metrics["loss/total"])


def test_boundary_loss_step(packed2d):
    cfg = _small_config(loss_fx=("Dice", "Boundary"), exclude_missing=True)
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(packed2d, cfg.batch_size)
    batch = next(pipe.epoch(jax.random.key(0)))
    state, metrics = tr._train_step(state, batch, jax.random.key(1))
    assert np.isfinite(metrics["loss/Boundary"])
    assert np.isfinite(metrics["loss/total"])


def test_dp_mesh_matches_single_device(packed2d):
    """The same batch through a 1-device jit and an 8-way DP mesh must give
    identical losses and (numerically) identical updated params."""
    cfg = _small_config(transform_degree=1)  # deterministic transform
    single = Trainer(cfg)
    dp = Trainer(cfg, mesh=make_mesh(8))

    s1 = single.init_state()
    s8 = dp.init_state()
    # identical init (same seed)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.params)[0]),
        np.asarray(jax.tree.leaves(s8.params)[0]),
    )

    pipe = DevicePipeline2D(packed2d, cfg.batch_size)
    batch = next(pipe.epoch(None))
    s1, m1 = single._train_step(s1, batch, jax.random.key(5))
    s8, m8 = dp._train_step(s8, dp.shard_batch(batch), jax.random.key(5))
    assert float(m1["loss/total"]) == pytest.approx(
        float(m8["loss/total"]), rel=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_checkpoint_round_trip(tmp_path, packed2d):
    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(packed2d, cfg.batch_size)
    batch = next(pipe.epoch(jax.random.key(0)))
    state, _ = tr._train_step(state, batch, jax.random.key(1))
    tr.save(tmp_path / "ckpt", state)

    tr2, state2 = Trainer.restore(tmp_path / "ckpt")
    assert tr2.config == cfg
    e1 = tr.eval_epoch(state.params, pipe, "val")
    e2 = tr2.eval_epoch(state2.params, pipe, "val")
    assert e1["val/dice/mean"] == pytest.approx(e2["val/dice/mean"], abs=1e-7)
    assert int(state2.step) == int(state.step)


def test_resume_uses_checkpointed_steps_per_epoch(tmp_path, packed2d):
    """The resume start-epoch must come from the CHECKPOINT's recorded
    schedule, not the current pipeline's batch count: resuming a run whose
    dataset/flags differ (e.g. --use_full_data forgotten) would otherwise
    derive the wrong epoch and silently under/over-train."""
    cfg = _small_config(epochs=2)
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe_big = DevicePipeline2D(packed2d, cfg.batch_size)  # 6 batches/epoch
    state = tr.fit(state, pipe_big, epochs=2)
    assert tr.config.steps_per_epoch == pipe_big.num_batches()
    tr.save(tmp_path / "ckpt", state)

    # Resume against a SMALLER dataset (half the slices -> fewer batches).
    small = PackedDataset2D(
        images=packed2d.images[:24],
        labels=packed2d.labels[:24],
        indicators=packed2d.indicators[:24],
    )
    tr2, state2 = Trainer.restore(tmp_path / "ckpt")
    assert tr2.config.steps_per_epoch == pipe_big.num_batches()
    pipe_small = DevicePipeline2D(small, cfg.batch_size)  # 3 batches/epoch
    seen = []
    with pytest.warns(UserWarning, match="batches/epoch"):
        state2 = tr2.fit(
            state2, pipe_small, epochs=3,
            callbacks=[lambda t, s, e: seen.append(e)],
        )
    # 12 steps at 6/epoch = 2 epochs done; exactly ONE more epoch runs.
    # (The naive step // pipeline_spe would say 12 // 3 = epoch 4 > 3 and
    # train nothing.)
    assert seen == [2]


def _synthetic_packed_3d(rng, n=3, shape=(12, 48, 48)):
    images, labels, indicators = [], [], []
    for i in range(n):
        img = rng.normal(40, 200, size=shape).astype(np.float32)
        lab = np.zeros(shape, np.uint8)
        c = rng.integers(1, 10)
        lab[3:8, 10:30, 10:30] = c
        img[lab > 0] += 150
        ind = np.zeros(9, np.float32)
        ind[c - 1] = 1
        images.append(img)
        labels.append(lab)
        indicators.append(ind)
    return PackedDataset3D(images, labels, indicators)


def test_3d_resize_training_step():
    from ctseg_tpu.volumetric.pipeline3d import DevicePipeline3D
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    ds = _synthetic_packed_3d(np.random.default_rng(0))
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        num_res_units=2,
        batch_size=1,
        loss_fx=("CrossEntropy",),
        spatial_dims=3,
        input_shape=(32, 32, 16),
        in_channels=1,
        plateau_patience=10_000,
    )
    tr = make_trainer_3d(cfg, mode="resize")
    pipe = DevicePipeline3D(ds, batch_size=1, shape=(32, 32, 16))
    state = tr.init_state()
    batch = next(pipe.epoch(jax.random.key(0)))
    state, metrics = tr._train_step(state, batch, jax.random.key(1))
    assert np.isfinite(metrics["loss/CrossEntropy"])
    ev = tr.eval_epoch(state.params, pipe, "val")
    assert np.isfinite(ev["val/dice/mean"])


def test_3d_patch_pipeline():
    from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    ds = _synthetic_packed_3d(np.random.default_rng(1), n=3, shape=(20, 48, 48))
    pipe = PatchPipeline3D(ds, batch_size=2, patch_size=(32, 32, 16))
    imgs, labs, inds = next(pipe.epoch(jax.random.key(0), steps=1))
    assert imgs.shape == (2, 32, 32, 16)
    assert labs.shape == (2, 32, 32, 16)
    assert inds.shape == (2, 9)

    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        num_res_units=1,
        batch_size=2,
        loss_fx=("Focal", "Dice"),
        spatial_dims=3,
        input_shape=(32, 32, 16),
        in_channels=1,
    )
    tr = make_trainer_3d(cfg, mode="patch")
    state = tr.init_state()
    state, metrics = tr._train_step(
        state, (imgs, labs, inds), jax.random.key(2)
    )
    assert np.isfinite(metrics["loss/total"])
