"""Per-site probe: fused conv3x3+IN+PReLU fwd+bwd vs XLA, per Model L level.

Compiles and times each stride-1 conv unit shape individually (bf16, batch
128) so VMEM-infeasible sites are identified one at a time instead of
crashing a whole-model compile. Run: python perf/probe_sites.py [budget_mb]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import ctseg_tpu.ops.pallas.conv_block as cb

BATCH = 128
SITES = [
    ("down0.unit1", 128, 64, 64),
    ("down1.unit1", 64, 128, 128),
    ("down2.unit1", 32, 256, 256),
    ("down3.unit1", 16, 512, 512),
    ("bottom.unit0", 16, 512, 1024),
    ("bottom.unit1", 16, 1024, 1024),
]


def time_fn(f, *args):
    out = f(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])  # hard sync
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / 10 * 1000


def main():
    budget_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cb.VMEM_BUDGET = budget_mb * 2**20
    rng = np.random.default_rng(0)

    for name, hw, cin, cout in SITES:
        ct = cb.pick_cout_tile(hw, hw, cin, cout, jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        a = jnp.asarray([0.25], jnp.float32)
        r = jnp.asarray(rng.normal(size=(BATCH, hw, hw, cout)), jnp.bfloat16)

        def loss_ref(x, w, b, a):
            return jnp.sum(cb.reference_conv3x3_in_prelu(x, w, b, a).astype(jnp.float32) * r)

        def loss_fused(x, w, b, a):
            return jnp.sum(cb.fused_conv3x3_in_prelu(x, w, b, a).astype(jnp.float32) * r)

        ref_g = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3)))
        try:
            t_ref = time_fn(ref_g, x, w, b, a)
        except Exception as e:
            print(f"{name}: XLA FAILED {type(e).__name__}", flush=True)
            continue
        if ct is None:
            print(f"{name}: ct=None (fallback) xla={t_ref:.2f}ms", flush=True)
            continue
        fused_g = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3)))
        try:
            t_fused = time_fn(fused_g, x, w, b, a)
            v_r, _ = ref_g(x, w, b, a)
            v_f, _ = fused_g(x, w, b, a)
            print(
                f"{name}: ct={ct} xla={t_ref:.2f}ms fused={t_fused:.2f}ms "
                f"speedup={t_ref / t_fused:.2f}x dloss={abs(float(v_r) - float(v_f)):.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: ct={ct} xla={t_ref:.2f}ms fused FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
