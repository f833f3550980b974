"""Probe: attribute the 3D step's MID-SITE roofline gap (VERDICT r4 #1).

perf/roofline3d_v5e.json leaves ~60 ms unattributed in the MXU-bound mid
sites. The per-site efficiencies cluster by CHANNEL WIDTH, not by depth
extent:

  C=64 sites   down0.unit1 0.43, up1.ru 0.43      <- exactly the two worst
  C>=128 sites down1.unit1 0.61, up2.ru 0.61, down2.unit1 0.63,
               bottom.unit1 0.68, down3.unit1 0.58

Hypothesis H1 (lane width): Cout=64 uses half of the 128-lane MXU output
tile, capping efficiency; the C>=128 cluster's 0.58-0.68 is the same
norm-chain overhead class the 2D roofline closed at 0.71-of-bound
(perf/roofline.py, PARITY.md roofline close-out).

Experiments (all fwd+bwd, serial in-dispatch chain per
roofline3d.py::measure_site, batch x spatial rescaled so every variant has
the SAME total FLOPs as down0.unit1 = 2.8 TFLOP):

  c64_base         conv3d+IN+PReLU 64->64 @ (64,64,8) b128 [reproduce 0.43]
  c128_q_batch     conv3d+IN+PReLU 128->128 @ (64,64,8) b32 [same FLOPs;
                   if efficiency jumps to the 0.6 class, H1 confirmed]
  c256_s_batch     conv3d+IN+PReLU 256->256 @ (64,64,8) b8
  c64_conv_only    c64_base without IN+PReLU [isolate norm-chain share]
  c128_conv_only   c128_q_batch without IN+PReLU
  c64_1x1          1x1x1 conv 64->64 @ (64,64,8) b128 + IN+PReLU is
                   HBM-bound; instead k=1 conv at 27x batch replicas is
                   impractical -> use a dense bf16 matmul with the SAME
                   contraction shape as the implicit GEMM:
  gemm_k1728_n64   (M=524288, K=1728, N=64) bf16 matmul  [the im2col GEMM
                   of c64_base; MXU ceiling for N=64]
  gemm_k1728_n128  (M=131072, K=3456, N=128) matmul of c128's GEMM shape

Run on the real chip: python perf/probe_mid_sites.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from perf.roofline3d import PEAK_BF16  # noqa: E402

CHAIN = 8


def time_chained(build_unit, inputs, grad=True, reps=5):
    """Time one unit fwd(+bwd) via the serial in-dispatch chain."""

    def chained(*args):
        @jax.checkpoint
        def body_fn(c, *a):
            y = build_unit(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.mean(y.astype(jnp.float32))

        def body(carry, _):
            c, acc = carry
            m = body_fn(c, *args)
            return (1e-30 * m, acc + m), None

        (c, acc), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), None, length=CHAIN
        )
        return acc

    if grad:
        f = jax.jit(jax.value_and_grad(chained, argnums=tuple(range(len(inputs)))))
    else:
        f = jax.jit(chained)

    out = f(*inputs)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*inputs)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (reps * CHAIN) * 1e3


def conv_unit(norm_act):
    dn = ("NHWDC", "HWDIO", "NHWDC")

    def unit(x, w, b, a):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3, dimension_numbers=dn,
        ) + b.astype(x.dtype)
        if not norm_act:
            return y
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2, 3), keepdims=True)
        xhat = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
        al = a.reshape(()).astype(jnp.float32)
        return jnp.where(xhat >= 0, xhat, al * xhat).astype(y.dtype)

    return unit


def conv_case(name, batch, vox, c, norm_act, rng):
    x = jnp.asarray(rng.normal(size=(batch, *vox, c)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, c, c)) * 0.02, jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    a = jnp.asarray([0.25], jnp.float32)
    ms = time_chained(conv_unit(norm_act), (x, w, b, a))
    flops = 3.0 * 2.0 * 27 * batch * vox[0] * vox[1] * vox[2] * c * c
    return {
        "name": name, "batch": batch, "vox": list(vox), "c": c,
        "norm_act": norm_act, "fwdbwd_ms": round(ms, 2),
        "mfu": round(flops / (ms / 1e3) / PEAK_BF16, 4),
    }


def grouped_case(name, norm_act, rng):
    """Measured-and-rejected fix attempt for the C=64 lane class: merge
    batch pairs into channels (batch 64, C=128) and run a grouped conv
    (feature_group_count=2, tied weights) so the output lane dim is 128.
    Numerically identical to c64_base (each merged channel is one
    (sample, channel) pair; IN stats unchanged in merged layout). Result:
    XLA's grouped-conv path on v5e is ~2.5x SLOWER than the ungrouped
    C=64 conv (0.245 vs 0.604 bare MFU) — rejected."""
    dn = ("NHWDC", "HWDIO", "NHWDC")

    def unit(x, w, b, a):
        wg = jnp.concatenate([w, w], axis=-1)
        y = jax.lax.conv_general_dilated(
            x, wg.astype(x.dtype), window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3, dimension_numbers=dn,
            feature_group_count=2,
        ) + jnp.concatenate([b, b]).astype(x.dtype)
        if not norm_act:
            return y
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2, 3), keepdims=True)
        xhat = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
        al = a.reshape(()).astype(jnp.float32)
        return jnp.where(xhat >= 0, xhat, al * xhat).astype(y.dtype)

    x = jnp.asarray(rng.normal(size=(64, 64, 64, 8, 128)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 64)) * 0.02, jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    a = jnp.asarray([0.25], jnp.float32)
    ms = time_chained(unit, (x, w, b, a))
    flops = 3.0 * 2.0 * 27 * 64 * 64 * 64 * 8 * 64 * 128
    return {
        "name": name, "norm_act": norm_act, "fwdbwd_ms": round(ms, 2),
        "mfu": round(flops / (ms / 1e3) / PEAK_BF16, 4),
    }


def gemm_case(name, m, k, n, rng):
    x = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)

    def unit(x, w):
        return x @ w

    ms = time_chained(unit, (x, w))
    flops = 3.0 * 2.0 * m * k * n
    return {
        "name": name, "m": m, "k": k, "n": n, "fwdbwd_ms": round(ms, 2),
        "mfu": round(flops / (ms / 1e3) / PEAK_BF16, 4),
    }


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = []
    cases = [
        lambda: conv_case("c64_base", 128, (64, 64, 8), 64, True, rng),
        lambda: conv_case("c128_q_batch", 32, (64, 64, 8), 128, True, rng),
        lambda: conv_case("c256_s_batch", 8, (64, 64, 8), 256, True, rng),
        lambda: conv_case("c64_conv_only", 128, (64, 64, 8), 64, False, rng),
        lambda: conv_case("c128_conv_only", 32, (64, 64, 8), 128, False, rng),
        # im2col GEMM shapes of c64 (M=b*vox=128*32768, K=27*64, N=64) is
        # 4.2M x 1728 x 64 -> too big for one HBM buffer in bf16 at chain
        # depth; scale M down 8x (same K, N -> same per-tile efficiency).
        lambda: grouped_case("c64_grouped_merged", False, rng),
        lambda: grouped_case("c64_grouped_merged_norm", True, rng),
        lambda: gemm_case("gemm_K1728_N64", 524288, 1728, 64, rng),
        lambda: gemm_case("gemm_K3456_N128", 131072, 3456, 128, rng),
        lambda: gemm_case("gemm_K1728_N128", 262144, 1728, 128, rng),
        lambda: gemm_case("gemm_K1728_N256", 131072, 1728, 256, rng),
    ]
    for c in cases:
        try:
            r = c()
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(r), flush=True)
        results.append(r)

    out = {
        "device": jax.devices()[0].device_kind,
        "what": (
            "channel-width attribution of the 3D mid-site roofline gap: "
            "equal-FLOPs conv3d(+IN+PReLU) variants across C in {64,128,"
            "256} plus the matching im2col-GEMM-shape bf16 matmuls"
        ),
        "results": results,
    }
    with open("perf/mid_sites_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
