"""Probe: where does the merged (D,C)-fold weight grad stop winning in D?

The merged dW (ops/shallow_grad.py::_dw_merged_3d) computes a (D+2p)*C x
D*Co 2D weight grad and extracts the true 3-band — (D+2p)/k redundant MACs,
linear in the activation depth. It was adopted from a single measurement at
the bench site D=16 ((D+2)/3 = 6x redundancy, 1.7x win because XLA's native
lane-poor dW burns ~10x). A deeper training patch (e.g. the reference's
whole-volume 3D mode, input_shape depth 48+) raises the redundancy past the
native path's inefficiency and the "optimization" inverts.

This probe sweeps D at the decoder site (full-res 10->10 conv, bf16) with
B*D held constant (same total voxels per measurement) and records
native/merged ms + the ratio, to ground the depth gate in
ops/shallow_grad.py::smallc_supported with data instead of extrapolation
(CLAUDE.md perf rule 3).

Run on the real chip: python perf/probe_merged_dw_depth.py

MEASURED VERDICT (v5e, perf/merged_dw_depth_v5e.json): no inversion in the
practical range — merged wins at every measured depth (1.73x @16, 1.68x @24,
1.87x @32, 1.47x @48, 1.85x @64). The redundancy argument above is real but
the native path's lane-starvation penalty stays larger through D=64. Gate set
at depth <= 64 (the measured envelope) in smallc_supported: beyond it both
the O(D) redundant MACs and the (D+2p)*C x D*Co intermediate (O(D^2) memory)
are unmeasured, so deeper activations fall back to the native dW.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from perf.probe_convgrad_shallow import dw_merged, dw_native, timeit  # noqa: E402


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.devices()[0].platform == "tpu", "run on the real chip"
    rng = np.random.default_rng(0)
    results = []
    for d in (16, 24, 32, 48, 64):
        b = 2048 // d
        sh = (b, 128, 128, d, 10)
        x = jnp.asarray(rng.standard_normal(sh), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal(sh), jnp.bfloat16)
        wshape = (3, 3, 3, 10, 10)
        row = {"depth": d, "batch": b, "shape": list(sh)}
        for name, fn in [("native", dw_native), ("merged", dw_merged)]:
            jitted = jax.jit(lambda a, c, f=fn: f(a, c, wshape))
            row[f"{name}_ms"] = round(timeit(jitted, x, dy) * 1000, 3)
        row["merged_speedup"] = round(row["native_ms"] / row["merged_ms"], 3)
        print(json.dumps(row), flush=True)
        results.append(row)

    with open("perf/merged_dw_depth_v5e.json", "w") as f:
        json.dump(
            {
                "device": jax.devices()[0].device_kind,
                "what": (
                    "merged (D,C)-fold dW vs native across activation "
                    "depth at the decoder 10->10 site, B*D held constant"
                ),
                "results": results,
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
