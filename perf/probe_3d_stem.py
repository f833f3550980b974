"""Probe: the 3D UNet's cin=1 stem conv vs an exact im2col reformulation.

The stem (batch, 128,128,16, cin=1 -> 64, k=3 stride 2) measured 4.3 ms at
batch 32 in isolation (perf/conv3d_sites_v5e.json, MFU 0.0043) — its FLOPs
are trivial, so the cost is the layout: a 1-channel tensor's minor dim is
lane-padded 1->128, making every read pay ~128x. The exact alternative:
drop the channel dim, put a large axis minor (no padding), extract the 27
taps as strided slices stacked into channels, and finish with ONE
(27 -> 64) matmul — identical taps and products, MXU-shaped.

Run on the real chip: python perf/probe_3d_stem.py
Writes perf/stem3d_v5e.json.

MEASURED VERDICT (v5e, batch 32): REJECTED, 0.23x — 16.9 ms vs 3.9 ms
native. The 27 strided-slice reads (stride 2 over what becomes the minor
axis) plus the stacked (..., 27)-channel intermediate (lane-padded 27->128
itself) cost far more than the cin=1 lane padding they avoid. XLA's native
conv already handles the 1-channel stem better than manual im2col; the
stem's cost is an input-layout floor, not a lowering bug. Keep native.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

V5E_PEAK_BF16 = 197e12
BATCH = 32
H, W, D = 128, 128, 16
COUT = 64
STRIDE = 2


def native(x, k):
    # x: (N, H, W, D, 1), k: (3, 3, 3, 1, COUT); model's symmetric padding.
    return jax.lax.conv_general_dilated(
        x, k, (STRIDE,) * 3, [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=jnp.float32,
    )


def im2col(x, k):
    """27 strided-slice taps stacked as channels + one (27->COUT) matmul."""
    n = x.shape[0]
    xs = x[..., 0]  # (N, H, W, D): no degenerate minor dim to lane-pad
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (1, 1)))
    ho, wo, do = H // STRIDE, W // STRIDE, D // STRIDE
    taps = []
    for i in range(3):
        for j in range(3):
            for kk in range(3):
                taps.append(
                    jax.lax.slice(
                        xp,
                        (0, i, j, kk),
                        (
                            n,
                            i + STRIDE * (ho - 1) + 1,
                            j + STRIDE * (wo - 1) + 1,
                            kk + STRIDE * (do - 1) + 1,
                        ),
                        (1, STRIDE, STRIDE, STRIDE),
                    )
                )
    x27 = jnp.stack(taps, axis=-1)  # (N, ho, wo, do, 27)
    w = k.reshape(27, COUT)  # tap order matches the (i, j, kk) loop
    return jax.lax.dot_general(
        x27, w, (((4,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def timeit(fn, *args, steps=30):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(BATCH, H, W, D, 1)), jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, COUT)) * 0.1, jnp.bfloat16)

    f_n = jax.jit(native)
    f_i = jax.jit(im2col)
    a = np.asarray(f_n(x, k), np.float32)
    b = np.asarray(f_i(x, k), np.float32)
    rel = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))

    t_n = timeit(f_n, x, k)
    t_i = timeit(f_i, x, k)
    flops = 2.0 * 27 * (H // 2) * (W // 2) * (D // 2) * COUT * BATCH
    out = {
        "device": jax.devices()[0].device_kind,
        "batch": BATCH,
        "native_ms": round(t_n * 1000, 3),
        "im2col_ms": round(t_i * 1000, 3),
        "native_mfu": round(flops / t_n / V5E_PEAK_BF16, 4),
        "im2col_mfu": round(flops / t_i / V5E_PEAK_BF16, 4),
        "rel_err": rel,
        "speedup": round(t_n / t_i, 2),
    }
    print(json.dumps(out, indent=1))
    with open("perf/stem3d_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
