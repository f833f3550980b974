"""Probe: shallow-channel transposed-conv weight grad at the 2D decoder site.

Companion to perf/probe_convgrad_shallow.py (3D sites). The 2D Model L final
up level runs ConvTranspose 128->10 at (128,128)->(256,256) with batch 128;
this measures whether the batchfeat reformulation (ops/shallow_grad.py::
_convt_smallc_bwd) wins there too, to decide the ndim gate in
smallc_supported. The plain 2D conv (10->10) is not probed: the 3D probe
showed batchfeat ties native on plain convs and the merged fold has no 2D
analogue (no small third spatial axis).

Run on the real chip: python perf/probe_convgrad_shallow2d.py

MEASURED VERDICT (v5e, batch 128, perf/convgrad_shallow2d_v5e.json):
ADOPTED. Isolated: native 5.24 ms -> batchfeat 3.56 ms (1.47x; floor
2.19 ms). Step-level same-process A/B on the bench 2D Model L config:
99.32 -> 98.61 ms/step (1288.7 -> 1298.1 patches/s, MFU 0.4795 -> 0.483) —
the isolated 1.7 ms compresses to ~0.7 ms in the full step, same pattern as
the 3D sites. smallc_supported gates the transposed rewrite on ndim in
(2, 3) accordingly.
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


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps


def convt2d(x, w):
    return lax.conv_transpose(
        x, w, (2, 2), [(1, 2)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def dwt_native(x, dy, wshape):
    _, vjp = jax.vjp(lambda w: convt2d(x, w), jnp.zeros(wshape, x.dtype))
    return vjp(dy)[0]


def dwt_batchfeat(x, dy, wshape):
    # Same math as ops/shallow_grad.py::_convt_smallc_bwd (f64-tested).
    dw = lax.conv_general_dilated(
        dy, x, (1, 1), [(1, 0)] * 2,
        rhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    dw = dw[:, ::-1, ::-1, :]
    return jnp.transpose(dw, (1, 2, 3, 0)).astype(x.dtype)


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 128, 128, 128)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((BATCH, 256, 256, 10)), jnp.bfloat16)
    wshape = (3, 3, 128, 10)
    row = {"site": "dec_convT_2d", "shape": list(x.shape)}
    for name, fn in [("native", dwt_native), ("batchfeat", dwt_batchfeat)]:
        jitted = jax.jit(lambda a, b, f=fn: f(a, b, wshape))
        row[f"{name}_ms"] = round(timeit(jitted, x, dy) * 1000, 3)
    row["floor_ms"] = round(
        timeit(
            jax.jit(
                lambda a, b: jnp.sum(jnp.square(a.astype(jnp.float32)))
                + jnp.sum(jnp.square(b.astype(jnp.float32)))
            ),
            x, dy,
        )
        * 1000, 3,
    )
    print(json.dumps(row), flush=True)
    with open("perf/convgrad_shallow2d_v5e.json", "w") as f:
        json.dump(
            {"device": jax.devices()[0].device_kind, "batch": BATCH,
             "what": "2D final-up ConvTranspose 128->10 weight-grad: "
                     "native vs batchfeat", "results": [row]},
            f, indent=1,
        )


if __name__ == "__main__":
    main()
