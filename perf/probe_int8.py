"""Is int8 worth it on v5e? Raw MXU probe for matmul and conv.

v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16. This probe answers whether
XLA actually lowers int8 `dot_general`/`conv_general_dilated` (int32
accumulation) to the fast path on this chip — the go/no-go for a
quantized inference mode. Run: python perf/probe_int8.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timeit(fn, *args, steps=20):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])  # full sync (axon)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def matmul_case(n, dtype, acc):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    else:
        a = jnp.asarray(rng.normal(size=(n, n)), dtype)
        b = jnp.asarray(rng.normal(size=(n, n)), dtype)

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )

    s = timeit(f, a, b)
    return 2.0 * n**3 / s / 1e12  # T(FL)OPS


def conv_case(batch, hw, cin, cout, dtype, acc):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, cin)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)), dtype)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), dtype)

    @jax.jit
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    s = timeit(f, x, k)
    flops = 2.0 * 9 * hw * hw * cin * cout * batch
    return flops / s / 1e12


def chain_case(batch, hw, cin, cout, quant):
    """conv -> InstanceNorm -> PReLU chain, as inference would run it.

    quant=True prices the FULL quantized-layer cost: per-tensor abs-max
    activation quantization, int8 conv with int32 accumulation, dequant,
    then the f32-stat IN + PReLU the architecture requires between every
    pair of convs. That requant/dequant traffic is what a kernel-level
    conv probe hides."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
    kscale = jnp.float32(0.02)
    alpha = jnp.float32(0.2)

    def in_prelu(y):
        m = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        v = jnp.var(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        yn = ((y.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5))
        return jnp.where(yn >= 0, yn, alpha * yn).astype(jnp.bfloat16)

    if quant:
        @jax.jit
        def f(x, kq):
            s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            y32 = jax.lax.conv_general_dilated(
                xq, kq, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return in_prelu(y32.astype(jnp.float32) * (s * kscale))

        return timeit(f, x, kq)
    @jax.jit
    def f(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return in_prelu(y)

    return timeit(f, x, k)


def main():
    results = {}
    for name, fn in {
        "matmul4096_bf16": partial(matmul_case, 4096, jnp.bfloat16, jnp.float32),
        "matmul4096_int8": partial(matmul_case, 4096, jnp.int8, jnp.int32),
        # bottom-of-UNet conv site (Model L level 4: 16x16x1024 @ batch 128)
        "conv_deep_bf16": partial(conv_case, 128, 16, 1024, 1024, jnp.bfloat16, jnp.float32),
        "conv_deep_int8": partial(conv_case, 128, 16, 1024, 1024, jnp.int8, jnp.int32),
        # mid conv site (level 2: 64x64x256)
        "conv_mid_bf16": partial(conv_case, 128, 64, 256, 256, jnp.bfloat16, jnp.float32),
        "conv_mid_int8": partial(conv_case, 128, 64, 256, 256, jnp.int8, jnp.int32),
        # full layer as inference runs it (ms, not TFLOPS): conv+IN+PReLU
        "chain_deep_bf16_ms": lambda: chain_case(128, 16, 1024, 1024, False) * 1e3,
        "chain_deep_int8_ms": lambda: chain_case(128, 16, 1024, 1024, True) * 1e3,
        "chain_mid_bf16_ms": lambda: chain_case(128, 64, 256, 256, False) * 1e3,
        "chain_mid_int8_ms": lambda: chain_case(128, 64, 256, 256, True) * 1e3,
        "chain_shallow_bf16_ms": lambda: chain_case(128, 256, 64, 64, False) * 1e3,
        "chain_shallow_int8_ms": lambda: chain_case(128, 256, 64, 64, True) * 1e3,
    }.items():
        try:
            results[name] = round(fn(), 1)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = f"error: {str(e)[:200]}"
        print(name, "->", results[name], flush=True)
    out = REPO / "perf" / "int8_v5e.json"
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
