"""Probe: forward+backward formulations for the 3D top decoder level (up0).

The 3D per-site roofline (perf/roofline3d_v5e.json) localizes ~50 ms of the
~139 ms total excess in the two full-resolution C=10 sites:

  up0.transp  128->10 stride-2 ConvTranspose, (64,64,8) -> (128,128,16):
              fwd 10.5 ms vs 2.9 attainable; f+b 30.2 vs 8.0 (3.8x).
  up0.ru      10->10 3^3 conv at (128,128,16): fwd 7.3 vs 1.6; f+b 32.9 vs
              4.9 native (6.7x). Production already swaps the dW (merged
              (D,C)-fold, ops/shallow_grad.py): f+b ~19.3 ms.

Round-4 hypothesis set (the dW is fixed; what about fwd and dx?):

  transp/packed    polyphase packed mode (models/layers.py::
                   _packed_conv_transpose): ONE stride-1 conv producing all
                   s^3=8 phases as 8*10=80 output features (62.5% lanes vs
                   10/128 native) + depth-to-space. MAC redundancy 2.37x
                   (1-tap phases padded to 2 taps) but ~8x better output
                   lane occupancy -> predicted ~1.8x fwd.
  transp/phases    polyphase per-phase convs (zero redundancy, but each
                   phase writes 10-lane outputs) - expected no win, pins
                   where the cost is.
  ru/foldD         the 10->10 conv as ONE 2D conv over the (D,C)-folded
                   layout with a banded 160x160 kernel (exact: out-of-band
                   slots zero). Lane theory says this CANNOT win: folding D
                   by f multiplies MACs by ~f while lane occupancy rises by
                   f, so MXU efficiency is invariant at ~C/128 (=10/128)
                   until f*C crosses a 128 tile, where occupancy 160/256 /
                   redundancy 5.33 ~= 11.7% vs native 7.8% -> <=1.3x best
                   case. Measured to close the question with data.

Run on the real chip: python perf/probe_transp3d.py

MEASURED VERDICT (v5e, batch 128, perf/transp3d_v5e.json): see the JSON and
PARITY.md's round-4 3D roofline close; this docstring intentionally does not
predict the step-level outcome (CLAUDE.md rule 3: only the compiled full
step decides adoption).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

BATCH = 128
CHAIN = 4


def timed(fn, args, chain=CHAIN, reps=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (reps * chain) * 1e3


def chain_scan(unit):
    """Serial in-dispatch chain (see perf/roofline3d.py::measure_site)."""

    def chained(x, w, b):
        @jax.checkpoint
        def body_fn(c, x, w, b):
            y = unit(x + c.astype(x.dtype), w, b)
            return jnp.mean(y.astype(jnp.float32))

        def body(carry, _):
            c, acc = carry
            m = body_fn(c, x, w, b)
            return (1e-30 * m, acc + m), None

        (_, acc), _ = lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), None, length=CHAIN
        )
        return acc

    return chained


def measure(unit, x, w, b):
    fwd = jax.jit(chain_scan(unit))
    both = jax.jit(jax.value_and_grad(chain_scan(unit), argnums=(0, 1, 2)))
    t_fwd = timed(fwd, (x, w, b))
    t_fb = timed(both, (x, w, b))  # remat: = 2*fwd + bwd
    return round(t_fwd, 2), round(t_fb - t_fwd, 2)


# ---------------------------------------------------- up0.transp formulations
def transp_native(x, w, b):
    return lax.conv_transpose(
        x, w.astype(x.dtype), strides=(2, 2, 2), padding=[(1, 2)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    ) + b.astype(x.dtype)


def transp_production(x, w, b):
    from ctseg_tpu.ops.shallow_grad import conv_transpose_smallc

    return conv_transpose_smallc(x, w.astype(x.dtype), b.astype(x.dtype), 2, 3)


def transp_phases(x, w, b):
    from ctseg_tpu.models.layers import polyphase_conv_transpose

    return polyphase_conv_transpose(x, w, b, 2, x.dtype, mode="phases")


def transp_packed(x, w, b):
    from ctseg_tpu.models.layers import polyphase_conv_transpose

    return polyphase_conv_transpose(x, w, b, 2, x.dtype, mode="packed")


# ------------------------------------------------------- up0.ru formulations
def ru_production(x, w, b):
    from ctseg_tpu.ops.shallow_grad import conv_smallc

    return conv_smallc(x, w.astype(x.dtype), b.astype(x.dtype), 1, 1)


def ru_foldd(x, w, b):
    """10->10 3^3 conv as one 2D conv over the (D,C) fold, banded kernel.

    W2[kh,kw,(din,ci),(dout,co)] = w[kh,kw, din-dout+1, ci, co] for
    |din-dout|<=1, else 0; out-of-range depth taps at the edges fall outside
    the band, which is exactly the 3D conv's zero padding.
    """
    bsz, h, wd, d, ci = x.shape
    k = w.shape[0]
    co = w.shape[-1]
    w = w.astype(x.dtype)
    din = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    dout = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    t = din - dout + 1
    valid = (t >= 0) & (t < k)
    w2 = jnp.where(
        valid[None, None, :, :, None, None],
        w[:, :, jnp.clip(t, 0, k - 1), :, :],  # (kh,kw,din,dout,ci,co)
        jnp.zeros((), x.dtype),
    )
    w2 = jnp.transpose(w2, (0, 1, 2, 4, 3, 5)).reshape(k, k, d * ci, d * co)
    xm = x.reshape(bsz, h, wd, d * ci)
    y = lax.conv_general_dilated(
        xm, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(bsz, h, wd, d, co) + b.astype(x.dtype)


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = {"device": jax.devices()[0].device_kind, "batch": BATCH}

    # Exactness spot-check on tiny shapes (full f64 equivalence is pinned in
    # tests/test_layers.py for polyphase and tests/test_shallow_grad.py for
    # smallc; this guards only the probe-local foldD code).
    xs = jnp.asarray(rng.normal(size=(2, 6, 6, 4, 10)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(3, 3, 3, 10, 10)), jnp.float32)
    bs = jnp.zeros((10,), jnp.float32)
    ref = lax.conv_general_dilated(
        xs, ws, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )
    np.testing.assert_allclose(
        np.asarray(ru_foldd(xs, ws, bs)), np.asarray(ref), atol=1e-4
    )
    print("foldD exactness ok", flush=True)

    # --- up0.transp: (B,64,64,8,128) -> (B,128,128,16,10) ---
    x = jnp.asarray(rng.normal(size=(BATCH, 64, 64, 8, 128)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 128, 10)) * 0.02, jnp.float32)
    b = jnp.zeros((10,), jnp.float32)
    for name, fn in [
        ("native", transp_native),
        ("production", transp_production),
        ("phases", transp_phases),
        ("packed", transp_packed),
    ]:
        f, bw = measure(fn, x, w, b)
        results[f"transp_{name}"] = {"fwd_ms": f, "bwd_ms": bw, "fb_ms": round(f + bw, 2)}
        print(f"transp/{name}: fwd {f} ms, f+b {f + bw:.2f} ms", flush=True)

    # --- up0.ru: 10->10 at (B,128,128,16) ---
    x = jnp.asarray(rng.normal(size=(BATCH, 128, 128, 16, 10)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 10, 10)) * 0.02, jnp.float32)

    def ru_native(x, w, b):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        ) + b.astype(x.dtype)

    for name, fn in [
        ("native", ru_native),
        ("production", ru_production),
        ("foldD", ru_foldd),
    ]:
        f, bw = measure(fn, x, w, b)
        results[f"ru_{name}"] = {"fwd_ms": f, "bwd_ms": bw, "fb_ms": round(f + bw, 2)}
        print(f"ru/{name}: fwd {f} ms, f+b {f + bw:.2f} ms", flush=True)

    with open("perf/transp3d_v5e.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
