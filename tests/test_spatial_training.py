"""Spatially-partitioned 3D training over a ('data', 'space') mesh.

GSPMD shards volume depth across devices and XLA inserts the conv halo
exchanges. The per-level sharding constraints (models/unet.py::
_constrain_depth) are load-bearing: without them XLA's SPMD partitioner
returns wrong GRADIENTS (not just reordered-float noise) once deep UNet
levels collapse under the shard count — reproduced and measured in
perf/probe_gspmd_depth.py. The f64 test here pins bit-level agreement
between the spatially-sharded model and the single-device reference, which
that bug would immediately break.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctseg_tpu.models.unet import SegmentationModel
from ctseg_tpu.parallel import make_spatial_mesh
from ctseg_tpu.training.trainer import TrainConfig, Trainer
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

from tests.test_e2e_train import _synthetic_packed_3d


def _f64_model(**kw):
    return SegmentationModel(
        out_channels=10,
        channels=(2, 4, 8, 16, 32),
        num_res_units=2,
        dtype=jnp.float64,
        **kw,
    )


def test_sharded_model_bitwise_f64():
    """Forward AND gradients agree at f64 precision with depth sharded 4-way
    (depth collapses to 1 at the bottleneck — the regime where unconstrained
    GSPMD miscompiles the backward)."""
    mesh = make_spatial_mesh(2, 4)
    single = _f64_model()
    sharded = _f64_model(spatial_mesh=mesh)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 16, 1)))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float64), single.init(jax.random.key(0), x)
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "space")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))

    ref = jax.jit(single.apply)(params, x)
    out = jax.jit(sharded.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    def loss_single(p, x):
        return (single.apply(p, x) ** 2).mean()

    def loss_sharded(p, x):
        return (sharded.apply(p, x) ** 2).mean()

    ga = jax.jit(jax.grad(loss_single))(params, x)
    gb = jax.jit(jax.grad(loss_sharded))(ps, xs)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_spatial_trainer_step_matches_single_device():
    """One patch-mode train step on a (2 data x 4 space) mesh vs one device:
    same loss and (numerically) same updated params. f32 compute — instance
    norm statistics all-reduce across space shards, so tolerances allow
    reordered-float noise but would catch the partitioner bug (5e-3+ there)."""
    from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D

    ds = _synthetic_packed_3d(np.random.default_rng(3), n=4, shape=(24, 48, 48))
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        num_res_units=2,
        batch_size=2,
        loss_fx=("Focal", "Dice"),
        spatial_dims=3,
        input_shape=(32, 32, 16),
        in_channels=1,
    )
    single = make_trainer_3d(cfg, mode="patch", patch_size=(32, 32, 16))
    mesh = make_spatial_mesh(2, 4)
    spatial = make_trainer_3d(
        cfg, mode="patch", patch_size=(32, 32, 16), mesh=mesh
    )
    assert spatial._spatial

    s1 = single.init_state()
    s8 = spatial.init_state()
    pipe = PatchPipeline3D(ds, batch_size=2, patch_size=(32, 32, 16))
    batch = next(pipe.epoch(jax.random.key(0), steps=1))
    s1, m1 = single._train_step(s1, batch, jax.random.key(5))
    s8, m8 = spatial._train_step(s8, spatial.shard_batch(batch), jax.random.key(5))
    assert float(m1["loss/total"]) == pytest.approx(
        float(m8["loss/total"]), rel=1e-4
    )
    # atol 2.5e-3 ~ 2*lr: Adam's first update is ~ +-lr*sign(g); where the
    # true gradient is near zero the cross-shard reduction reorder can flip
    # the sign (observed on ~0.2% of weights). The f64 test above pins exact
    # agreement; the partitioner bug this guards against is >5e-3 EVERYWHERE.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=2.5e-3
        )
    # the staged batch really is depth-sharded over 'space'
    imgs = spatial.shard_batch(batch)[0]
    assert imgs.sharding.spec == jax.sharding.PartitionSpec(
        "data", None, None, "space"
    )


def test_spatial_eval_step_runs():
    """Padded eval step under the spatial mesh produces finite metrics."""
    from ctseg_tpu.volumetric.pipeline3d import DevicePipeline3D

    ds = _synthetic_packed_3d(np.random.default_rng(4), n=3, shape=(16, 32, 32))
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        num_res_units=1,
        batch_size=2,
        loss_fx=("CrossEntropy",),
        spatial_dims=3,
        input_shape=(32, 32, 16),
        in_channels=1,
        plateau_patience=10_000,
    )
    mesh = make_spatial_mesh(2, 4)
    tr = make_trainer_3d(cfg, mode="resize", mesh=mesh)
    state = tr.init_state()
    pipe = DevicePipeline3D(ds, batch_size=2, shape=(32, 32, 16))
    metrics = tr.eval_epoch(state.params, pipe, "val")
    assert np.isfinite(metrics["val/dice/mean"])


def test_2d_trainer_ignores_space_axis():
    """A 2D config on a ('data','space') mesh degrades to plain DP."""
    cfg = TrainConfig(
        filters=(2, 4, 8, 16, 32),
        num_res_units=1,
        batch_size=8,
        transform_degree=1,
        loss_fx=("Focal",),
        input_size=32,
    )
    tr = Trainer(cfg, mesh=make_spatial_mesh(4, 2))
    assert not tr._spatial
    assert tr.model.spatial_mesh is None
