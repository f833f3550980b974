"""Reproduce + fix: wrong GRADIENTS from XLA's SPMD partitioner on deep
UNets with depth-axis ("space") sharding.

Finding (CPU backend, 8 virtual devices, JAX 0.9): with volumes sharded
(N, H, W, D, C) -> P('data', None, None, 'space') and shardings left to
GSPMD propagation, the FORWARD pass is bit-exact at f64 but the BACKWARD is
systematically wrong once the stack is >= 4 strided levels deep and the
deep-level depth extent collapses under the shard count:

  - full f64 model: fwd diff 3.6e-14, grad diff 1.9e-01 (same value at f32
    -> deterministic miscompile, not float reorder)
  - every unit in isolation (ConvUnit / ConvTransposeUnit / ResidualUnit /
    instance_norm_prelu custom VJP, all dtypes): exact
  - raw nn.Conv/nn.ConvTranspose 4-level skeleton: grad diff ~1e-5 at f64
    (>> 1e-15 rounding), so the defect is in conv partitioning itself, not
    this repo's custom ops
  - corruption enters at the deepest transposed conv's backward and
    propagates to every upstream (encoder) parameter

Fix shipped in models/unet.py::_constrain_depth: pin every level's sharding
explicitly — depth sharded over 'space' while the per-shard extent is >=
min_depth_per_shard and divisible, depth REPLICATED below that. With the
constraints the f64 fwd AND grads agree to f64 rounding (~1e-15); the
replicated deep levels are the cheap ones (tiny spatial extent), so nothing
material is lost — spatial partitioning only ever paid off at large extents.

Run on a >= 8-device mesh (or CPU: env -u PYTHONPATH JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8):

    python perf/probe_gspmd_depth.py
"""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from ctseg_tpu.models.unet import SegmentationModel  # noqa: E402


def main():
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "space"))
    sh = NamedSharding(mesh, P("data", None, None, "space"))
    rep = NamedSharding(mesh, P())

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 16, 1)))

    for fixed in (False, True):
        model = SegmentationModel(
            out_channels=10,
            channels=(2, 4, 8, 16, 32),
            num_res_units=2,
            dtype=jnp.float64,
            spatial_mesh=mesh if fixed else None,
        )
        ref_model = SegmentationModel(
            out_channels=10,
            channels=(2, 4, 8, 16, 32),
            num_res_units=2,
            dtype=jnp.float64,
        )
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            ref_model.init(jax.random.key(0), x),
        )

        def loss(apply, p, xx):
            return (apply(p, xx) ** 2).mean()

        ref_f = jax.jit(ref_model.apply)(params, x)
        ga = jax.jit(jax.grad(lambda p, xx: loss(ref_model.apply, p, xx)))(
            params, x
        )
        ps, xs = jax.device_put(params, rep), jax.device_put(x, sh)
        out = jax.jit(model.apply)(ps, xs)
        gb = jax.jit(jax.grad(lambda p, xx: loss(model.apply, p, xx)))(ps, xs)
        fwd = float(jnp.max(jnp.abs(out - ref_f)))
        grad = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb))
        )
        label = "with per-level constraints" if fixed else "GSPMD propagation"
        print(f"{label:<28} fwd {fwd:.2e}  grad {grad:.2e}")


if __name__ == "__main__":
    main()
