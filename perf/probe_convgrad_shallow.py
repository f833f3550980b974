"""Probe: weight-gradient formulations for the shallow-channel decoder convs.

The 3D step trace (perf/profile3d_b128_v5e.json) shows 35 ms of the 238.6 ms
step in the weight gradients of the full-resolution 10-channel decoder convs
(copy_subtract_fusion.1 19.7 ms + fusion.25 15.8 ms): with C=10 the operands
occupy 10/128 lanes and XLA's conv-weight-grad runs at ~6% of HBM bandwidth.
The traffic floor for those ops (read X once + read dY once) is ~3.4 ms.

Candidate reformulations, all pure XLA (no Pallas — the obstruction is layout,
not fusion):

  batchfeat  dW as a convolution with BATCH as the contracted feature dim:
             dW[ci,kh,kw,kd,co] = conv(lhs=Xpad "CHWDN", rhs=dY "IHWDO").
             The contraction now runs over a 128-wide (lane-full) feature dim
             and a 2M-deep spatial window; out is the tiny (Ci,3,3,3,Co).
             Zero redundant FLOPs.
  merged     fold (D, C) into one 160/180-wide feature axis and take the
             weight-grad of the equivalent 2D conv; the true dW is a banded
             diagonal extraction (exact index bookkeeping, 5.3x redundant
             FLOPs but full lanes).

Run on the real chip: python perf/probe_convgrad_shallow.py

MEASURED VERDICT (v5e, batch 128, perf/convgrad_shallow_v5e.json): ADOPTED,
but not the formulation this probe was designed around. Isolated:
dec_conv10 native 33.4 ms, batchfeat 33.3 (TIE — XLA's huge-kernel conv is
equally lane-poor), merged 19.3 (1.7x), floor 3.4; dec_convT native 13.9,
batchfeat 11.3 (1.24x); stem native 2.8 (fine). Step-level (the only truth,
CLAUDE.md rule 3), same-session A/B on the bench 3D config: native
247.0 ms/step vs merged+convT-batchfeat 240.5-240.8 ms/step (reproduced
twice, ~2.7%, MFU 0.385 -> 0.396). Two step-level surprises worth keeping:
(a) the isolated 16 ms of wins compress to ~6.5 ms in the full step — XLA
was already fusing part of the native dW cost with neighboring ops; (b) a
"cheaper" no-pad variant of merged (the depth fold as a pure bitcast view,
zero-tap boundary handling in the band extraction) measured SLOWER end to
end (246.7 ms/step) than the version that materializes a padded copy — the
explicit pad hands XLA a layout the merged conv tiles well. Integrated in
ops/shallow_grad.py (merged for the 3D plain conv, batchfeat for the 3D
transposed conv, native elsewhere), f64-differential-tested in
tests/test_shallow_grad.py.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

V5E_PEAK_BF16 = 197e12
BATCH = 128


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps


# --------------------------------------------------------- plain conv (3^3)
def conv3d(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )


def dw_native(x, dy, wshape):
    _, vjp = jax.vjp(lambda w: conv3d(x, w), jnp.zeros(wshape, x.dtype))
    return vjp(dy)[0]


def dw_batchfeat(x, dy, wshape):
    """dW via conv with batch as the contracted feature dimension.

    out[ci, kh, kw, kd, co] = sum_{b,h,w,d} xp[b,h+kh,w+kw,d+kd,ci] dy[b,h,w,d,co]
    lhs = xp with (batch=ci, feature=b, spatial hwd)   -> "CHWDN"
    rhs = dy with (I=b, O=co, spatial hwd)             -> "IHWDO"
    out = (ci, 3, 3, 3, co)                            -> "NHWDC"
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dw = lax.conv_general_dilated(
        xp, dy, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("CHWDN", "IHWDO", "NHWDC"),
        preferred_element_type=jnp.float32,
    )  # (ci, 3, 3, 3, co)
    return jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(x.dtype)


def dw_merged(x, dy, wshape):
    """Fold (D, C) into the feature axis; banded extraction of the true dW."""
    b, h, w, d, c = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xm = xp.reshape(b, h + 2, w + 2, (d + 2) * c)
    dym = dy.reshape(b, h, w, d * co)
    _, vjp = jax.vjp(
        lambda w2: lax.conv_general_dilated(
            xm, w2, (1, 1), [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        jnp.zeros((3, 3, (d + 2) * c, d * co), x.dtype),
    )
    m6 = vjp(dym)[0].reshape(3, 3, d + 2, c, d, co).astype(jnp.float32)
    # dw[kh,kw,kd,ci,co] = sum_q m6[kh,kw,q+kd,ci,q,co]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (3, d + 2, d), 1)
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (3, d + 2, d), 2)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (3, d + 2, d), 0)
    ind = (p_idx == q_idx + k_idx).astype(jnp.float32)
    return jnp.einsum("hwpiqo,kpq->hwkio", m6, ind).astype(x.dtype)


# ------------------------------------------------- transposed conv (stride 2)
def convt3d(x, w):
    # The model's convention (models/layers.py::ConvTransposeUnit):
    # pad (k-1-p, k-1-p+s-1) = (1, 2) on the dilated input, out = in * 2.
    return lax.conv_transpose(
        x, w, (2, 2, 2), [(1, 2)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )


def dwt_native(x, dy, wshape):
    _, vjp = jax.vjp(lambda w: convt3d(x, w), jnp.zeros(wshape, x.dtype))
    return vjp(dy)[0]


def dwt_batchfeat(x, dy, wshape):
    """Transposed-conv dW via conv(lhs=dY, rhs=X dilated 2, batch as feature).

    conv_transpose does not flip the kernel: o = 2i + pad_lo - t, so
    dW[t] = sum_i x[i] dy[2i + 1 - t]; conv with lhs padding (1, 0) and
    rhs_dilation 2 yields the result spatially flipped (r = 2 - t).
    Same math as ops/shallow_grad.py::_convt_smallc_bwd (f64-tested there).
    """
    dw = lax.conv_general_dilated(
        dy, x, (1, 1, 1), [(1, 0)] * 3,
        rhs_dilation=(2, 2, 2),
        dimension_numbers=("CHWDN", "IHWDO", "NHWDC"),
        preferred_element_type=jnp.float32,
    )  # (co, 3, 3, 3, ci) spatially flipped
    dw = dw[:, ::-1, ::-1, ::-1, :]
    return jnp.transpose(dw, (1, 2, 3, 4, 0)).astype(x.dtype)


# ---------------------------------------------------------------------- floor
def floor_read(x, dy):
    """Reads both tensors once: the traffic floor for any dW formulation."""
    return jnp.sum(x.astype(jnp.float32) * dy.astype(jnp.float32))


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = []
    # Correctness of every formulation is pinned in f64 against the native
    # VJP by tests/test_shallow_grad.py — no on-TPU checks here (each extra
    # jitted function costs 30-90 s of remote compile on this tunneled chip).

    # --- site 1: final decoder 3^3 conv 10->10 at full res (128,128,16) ---
    sh = (BATCH, 128, 128, 16, 10)
    x = jnp.asarray(rng.standard_normal(sh), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal(sh), jnp.bfloat16)
    wshape = (3, 3, 3, 10, 10)
    row = {"site": "dec_conv10", "shape": list(sh)}
    for name, fn in [
        ("native", dw_native),
        ("batchfeat", dw_batchfeat),
        ("merged", dw_merged),
    ]:
        jitted = jax.jit(lambda a, b, f=fn: f(a, b, wshape))
        row[f"{name}_ms"] = round(timeit(jitted, x, dy) * 1000, 3)
    row["floor_ms"] = round(timeit(jax.jit(floor_read), x, dy) * 1000, 3)
    print(json.dumps(row), flush=True)
    results.append(row)

    # --- site 2: final ConvTranspose 128->10, (64,64,8) -> (128,128,16) ---
    xt = jnp.asarray(
        rng.standard_normal((BATCH, 64, 64, 8, 128)), jnp.bfloat16
    )
    wtshape = (3, 3, 3, 128, 10)
    row = {"site": "dec_convT", "shape": list(xt.shape)}
    for name, fn in [("native", dwt_native), ("batchfeat", dwt_batchfeat)]:
        jitted = jax.jit(lambda a, b, f=fn: f(a, b, wtshape))
        row[f"{name}_ms"] = round(timeit(jitted, xt, dy) * 1000, 3)
    row["floor_ms"] = round(
        timeit(
            jax.jit(
                lambda a, b: jnp.sum(jnp.square(a.astype(jnp.float32)))
                + jnp.sum(jnp.square(b.astype(jnp.float32)))
            ),
            xt, dy,
        )
        * 1000, 3,
    )
    print(json.dumps(row), flush=True)
    results.append(row)

    # --- site 3: stem conv 1->64 stride 2 (is its native dW already fine?) ---
    xst = jnp.asarray(rng.standard_normal((BATCH, 128, 128, 16, 1)), jnp.bfloat16)
    dyst = jnp.asarray(rng.standard_normal((BATCH, 64, 64, 8, 64)), jnp.bfloat16)

    def conv_stem(x_, w):
        return lax.conv_general_dilated(
            x_, w, (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )

    def dwst_native(a, b, ws):
        _, vjp = jax.vjp(lambda w: conv_stem(a, w), jnp.zeros(ws, a.dtype))
        return vjp(b)[0]

    row = {"site": "stem", "shape": list(xst.shape)}
    jitted = jax.jit(lambda a, b: dwst_native(a, b, (3, 3, 3, 1, 64)))
    row["native_ms"] = round(timeit(jitted, xst, dyst) * 1000, 3)
    print(json.dumps(row), flush=True)
    results.append(row)

    with open("perf/convgrad_shallow_v5e.json", "w") as f:
        json.dump(
            {
                "device": jax.devices()[0].device_kind,
                "batch": BATCH,
                "what": (
                    "weight-grad formulations for the shallow-channel "
                    "full-resolution decoder convs (trace: 35 ms of the "
                    "238.6 ms 3D step)"
                ),
                "results": results,
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
