"""Microbench: transposed-conv+IN+PReLU fwd+bwd at Model L's up sites —
XLA's dilated-input lowering vs the dense polyphase decomposition
(ctseg_tpu/models/layers.py::polyphase_conv_transpose).
Run: python perf/probe_transp.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 128
SITES = [  # (name, hw_in, cin, cout)
    ("up3_transp", 16, 1536, 256),
    ("up2_transp", 32, 512, 128),
    ("up1_transp", 64, 256, 64),
    ("up0_transp", 128, 128, 10),
]
EPS = 1e-5


def _in_prelu(y, alpha):
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
    xhat = (y32 - mean) * jax.lax.rsqrt(var + EPS)
    a = alpha.reshape(()).astype(jnp.float32)
    return jnp.where(xhat >= 0, xhat, a * xhat).astype(y.dtype)


def poly_convt_in_prelu(x, w, b, alpha):
    from ctseg_tpu.models.layers import polyphase_conv_transpose

    y = polyphase_conv_transpose(x, w, b, 2, x.dtype)
    return _in_prelu(y, alpha)


def packed_convt_in_prelu(x, w, b, alpha):
    from ctseg_tpu.models.layers import polyphase_conv_transpose

    y = polyphase_conv_transpose(x, w, b, 2, x.dtype, mode="packed")
    return _in_prelu(y, alpha)


def convt_in_prelu(x, w, b, alpha):
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(2, 2), padding=[(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
    xhat = (y32 - mean) * jax.lax.rsqrt(var + EPS)
    a = alpha.reshape(()).astype(jnp.float32)
    return jnp.where(xhat >= 0, xhat, a * xhat).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    total = 0.0
    for name, hw, cin, cout in SITES:
        x = jnp.asarray(rng.normal(size=(BATCH, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        a = jnp.asarray([0.25], jnp.float32)
        r = jnp.asarray(
            rng.normal(size=(BATCH, 2 * hw, 2 * hw, cout)), jnp.bfloat16
        )

        useful_gf = 2 * 9 * hw * hw * cin * cout * BATCH / 1e9
        for tag, unit in (("xla", convt_in_prelu), ("poly", poly_convt_in_prelu), ("packed", packed_convt_in_prelu)):
            # r is a jit ARGUMENT (a closure would bake a 100+MB constant
            # into the program and blow up the remote compile payload).
            def loss(x, w, b, a, r, unit=unit):
                return jnp.sum(unit(x, w, b, a).astype(jnp.float32) * r)

            f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
            fwd = jax.jit(unit)
            out = fwd(x, w, b, a)
            float(out.astype(jnp.float32).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(x, w, b, a)
            float(out.astype(jnp.float32).ravel()[0])
            dt_fwd = (time.perf_counter() - t0) / 10 * 1000

            v, _ = f(x, w, b, a, r)
            float(v)
            t0 = time.perf_counter()
            for _ in range(10):
                v, _ = f(x, w, b, a, r)
            float(v)
            dt = (time.perf_counter() - t0) / 10 * 1000
            total += dt
            print(
                f"{name} [{tag}]: fwd {dt_fwd:.2f}ms "
                f"({useful_gf / dt_fwd:.0f} GF/ms), fwd+bwd {dt:.2f}ms "
                f"({3 * useful_gf / dt:.0f} GF/ms useful)",
                flush=True,
            )
    print(f"total (xla+poly) convT fwd+bwd: {total:.1f} ms")


if __name__ == "__main__":
    main()
