"""Probe: per-level 3D conv MFU on v5e, and a kz-decomposition alternative.

The 3D UNet forward runs at ~0.23 MFU vs 0.56 for the same-family 2D model
(perf/probe_3d_breakdown.py). This measures each encoder/decoder conv site
in isolation to find where the gap lives, and compares XLA's native conv3d
against an exact decomposition into kd 2D convs over shifted depth slices
(conv3d(k=3) == sum_kz conv2d(shift(x, kz), W[:, :, kz])), which maps the
work onto the same conv2d kernels the 2D model gets 0.56 MFU from.

Run on the real chip: python perf/probe_conv3d_sites.py

MEASURED VERDICT (v5e, batch 32, perf/conv3d_sites_v5e.json): REJECTED.
Native conv3d wins at EVERY site (rel_err ~1e-7 with the model's symmetric
padding at all sites). The large stride-1 sites (res1/res2) already run at
MFU 0.59-0.61 natively — the same efficiency the 2D model gets — while the
decomposition is 1.3-1.5x slower there (three kernel launches + kz-shift
traffic beat XLA's single fused conv) and 1.7-6x slower at the strided
sites. The 3D model's MFU gap vs 2D lives in the strided downsamplers at
small depth and the cin=1 stem, which the decomposition does not help.
Keep native conv3d.
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

# (H, W, D, Cin, Cout, stride) for each encoder level of the (128,128,16)
# patch UNet, filters 64..1024 (shapes BEFORE the strided conv).
SITES = [
    ("down0", 128, 128, 16, 1, 64, 2),
    ("down1", 64, 64, 8, 64, 128, 2),
    ("down2", 32, 32, 4, 128, 256, 2),
    ("down3", 16, 16, 2, 256, 512, 2),
    ("bottom", 8, 8, 1, 512, 1024, 1),
    ("res1", 64, 64, 8, 128, 128, 1),  # residual second subunit
    ("res2", 32, 32, 4, 256, 256, 1),
]


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jnp.asarray(out).block_until_ready()
    float(out.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps


def conv3d_flops(h, w, d, cin, cout, stride, batch):
    ho, wo, do = h // stride, w // stride, max(d // stride, 1)
    return 2.0 * 27 * ho * wo * do * cin * cout * batch


def native(x, k, stride):
    # Explicit symmetric (k-1)//2 padding — the model's torch-style
    # convention (models/layers.py::ConvUnit), NOT XLA "SAME" (which pads
    # asymmetrically under stride and would make the two paths disagree).
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride, stride), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=jnp.float32,
    )


def decomposed(x, k, stride):
    """sum_kz conv2d(shift(x, kz), k[:, :, kz]): exact same math.

    Depth becomes part of the 2D conv batch; the kz shift is a pad+slice;
    depth stride is a post-hoc subsample of the kz-sum.
    """
    n, h, w, d, cin = x.shape
    cout = k.shape[-1]
    # pad depth by 1 both sides (SAME for k_d=3)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    y = None
    for kz in range(3):
        xs = jax.lax.slice_in_dim(xp, kz, kz + d, axis=3)  # (n,h,w,d,cin)
        # fold depth into batch for a pure 2D conv
        xb = jnp.moveaxis(xs, 3, 1).reshape(n * d, h, w, cin)
        yb = jax.lax.conv_general_dilated(
            xb, k[:, :, kz], (stride, stride), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        ho, wo = yb.shape[1:3]
        ys = jnp.moveaxis(yb.reshape(n, d, ho, wo, cout), 1, 3)
        y = ys if y is None else y + ys
    if stride > 1:
        y = y[:, :, :, ::stride]
    return y


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = []
    for name, h, w, d, cin, cout, stride in SITES:
        x = jnp.asarray(
            rng.standard_normal((BATCH, h, w, d, cin)), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.02, jnp.bfloat16
        )
        f_native = jax.jit(lambda x, k, s=stride: native(x, k, s))
        f_decomp = jax.jit(lambda x, k, s=stride: decomposed(x, k, s))
        # numerics check at this size (bf16 tolerance)
        a = np.asarray(f_native(x, k), np.float32)
        b = np.asarray(f_decomp(x, k), np.float32)
        err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-6))
        t_n = timeit(f_native, x, k)
        t_d = timeit(f_decomp, x, k)
        flops = conv3d_flops(h, w, d, cin, cout, stride, BATCH)
        r = {
            "site": name,
            "shape_hwd": [h, w, d],
            "cin_cout_stride": [cin, cout, stride],
            "native_ms": round(t_n * 1000, 3),
            "decomp_ms": round(t_d * 1000, 3),
            "native_mfu": round(flops / t_n / V5E_PEAK_BF16, 4),
            "decomp_mfu": round(flops / t_d / V5E_PEAK_BF16, 4),
            "rel_err": err,
        }
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("perf/conv3d_sites_v5e.json", "w") as f:
        json.dump({
            "device": jax.devices()[0].device_kind,
            "batch": BATCH,
            "what": (
                "per-site 3D conv: XLA native conv3d vs exact kz "
                "decomposition into 3 conv2d over shifted depth slices"
            ),
            "results": results,
        }, f, indent=1)


if __name__ == "__main__":
    main()
