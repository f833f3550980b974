"""Probe: packed depth-fold forward for the lane-starved 3D stem conv.

perf/conv3d_sites_v5e.json measured the stem (Cin=1, stride 2, batch 32) at
4.3 ms native — ~20x its traffic floor (~17 MB in + 134 MB out): with one
input channel the conv occupies 1/128 lanes. The kz-decomposition and
im2col rewrites both lost (conv3d_sites, stem3d probes). This probe tries
the trick that won for the decoder weight grads (ops/shallow_grad.py):
fold (D, Cin) into one feature axis — a free bitcast view — and run ONE 2D
conv whose packed kernel embeds the depth taps:

    y[b,h',w',d',co] = sum_{kh,kw,kd} x[b,2h'+kh-1,2w'+kw-1,2d'+kd-1,ci] w[...]
    == conv2d(xm[B,H,W,D*ci], W2[kh,kw,(d,ci),(d',co)], stride 2, pad 1)
    with W2[kh,kw,(d,ci),(d',co)] = w[kh,kw,d-2d'+1,ci,co] (zero outside)

Cin_eff = D*ci = 16 and Cout_eff = (D/2)*cout = 512 lanes (vs 1 and 64),
at a 16/3x dense-MAC overhead that is free if the op stays bandwidth-bound.
The packed kernel is built from w INSIDE the step (tiny scatter), so
autodiff provides backward through the same lane-full conv — no custom VJP.

Run on the real chip: python perf/probe_stem_packed.py
Measured verdict: perf/stem_packed_v5e.json + docstring once measured.
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
H = W = 128
D = 16
CIN, COUT = 1, 64
K, S = 3, 2


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps


def stem_native(x, w):
    return lax.conv_general_dilated(
        x, w, (S, S, S), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )


def _pack_kernel(w, d_in, d_out):
    """W2[kh,kw,(d,ci),(d',co)] = w[kh,kw,d-S*d'+1,ci,co] (zero outside)."""
    kh, kw, kd, ci, co = w.shape
    # kd index for each (d, d') pair; mask invalid taps.
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d_in, d_out), 0)
    dp_idx = jax.lax.broadcasted_iota(jnp.int32, (d_in, d_out), 1)
    t = d_idx - S * dp_idx + 1  # pad_lo = (K-1)//2 = 1
    valid = (t >= 0) & (t < kd)
    tc = jnp.clip(t, 0, kd - 1)
    # w[kh,kw,tc,ci,co] gathered over the (d, d') grid -> (kh,kw,d,d',ci,co)
    w2 = jnp.where(
        valid[None, None, :, :, None, None],
        w[:, :, tc, :, :],  # (kh,kw,d,d',ci,co)
        0.0,
    )
    # -> (kh, kw, (d,ci), (d',co))
    w2 = jnp.transpose(w2, (0, 1, 2, 4, 3, 5))
    return w2.reshape(kh, kw, d_in * ci, d_out * co)


def stem_packed(x, w):
    b, h, wd, d, ci = x.shape
    co = w.shape[-1]
    d_out = d // S
    xm = x.reshape(b, h, wd, d * ci)
    w2 = _pack_kernel(w.astype(x.dtype), d, d_out)
    y = lax.conv_general_dilated(
        xm, w2, (S, S), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, h // S, wd // S, d_out, co)


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, H, W, D, CIN)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((K, K, K, CIN, COUT)) * 0.1, jnp.bfloat16
    )
    dy = jnp.asarray(
        rng.standard_normal((BATCH, H // S, W // S, D // S, COUT)),
        jnp.bfloat16,
    )

    # correctness (cheap at this size; bf16 tolerance)
    a = np.asarray(jax.jit(stem_native)(x[:4], w), np.float32)
    bb = np.asarray(jax.jit(stem_packed)(x[:4], w), np.float32)
    rel = float(np.max(np.abs(a - bb)) / max(np.max(np.abs(a)), 1e-6))

    def fwd_bwd(f):
        def run(x_, w_, dy_):
            out, vjp = jax.vjp(lambda xx, ww: f(xx, ww), x_, w_)
            return vjp(dy_)
        return jax.jit(run)

    row = {
        "rel_err": rel,
        "native_fwd_ms": round(timeit(jax.jit(stem_native), x, w) * 1000, 3),
        "packed_fwd_ms": round(timeit(jax.jit(stem_packed), x, w) * 1000, 3),
        "native_fwd_bwd_ms": round(
            timeit(fwd_bwd(stem_native), x, w, dy) * 1000, 3
        ),
        "packed_fwd_bwd_ms": round(
            timeit(fwd_bwd(stem_packed), x, w, dy) * 1000, 3
        ),
    }
    print(json.dumps(row), flush=True)
    with open("perf/stem_packed_v5e.json", "w") as f:
        json.dump(
            {"device": jax.devices()[0].device_kind, "batch": BATCH,
             "shape": [BATCH, H, W, D, CIN], "cout": COUT,
             "what": "3D stem conv (cin=1, stride 2): native vs packed "
                     "depth-fold 2D conv", "results": [row]},
            f, indent=1,
        )


if __name__ == "__main__":
    main()
