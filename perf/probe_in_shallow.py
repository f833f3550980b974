"""Probe: is the full-resolution C=10 InstanceNorm+PReLU lane-bound?

After the weight-grad fix (perf/probe_convgrad_shallow.py), the next
largest non-conv buckets in the 3D step trace are divide_subtract_fusion
(43.9 ms) and convert_reduce_fusion (31.4 ms) — norm/reduction fusions.
The decoder's full-res IN+PReLU runs on (128, 128, 128, 16, 10) bf16
(671 MB): if its spatial reductions degrade with C=10 in the lanes the way
the conv weight grad did (6% of BW), this one site would cost ~30 ms and be
worth a layout rewrite; if it runs near bandwidth (~5-7 ms for the fwd+bwd
pair), the remaining norm cost is already traffic-floor and the 2D round-3
verdict (fused IN kernel family: 0.28x end-to-end, rejected) carries over.

Run on the real chip: python perf/probe_in_shallow.py

MEASURED VERDICT (v5e, perf/in_shallow_v5e.json): NO TARGET HERE. The
full-res C=10 fwd+bwd moves its ~7-tensor traffic at 529 GB/s effective
(65% of the ~810 GB/s peak) vs 605 GB/s at the lane-full halfres C=64
site — a ~13% lane penalty, not the ~10x cliff the conv weight grads had.
The IN/PReLU cost in the 3D step is therefore near its traffic floor;
the round-3 2D verdict (fused IN+PReLU Pallas family: 0.28x end-to-end,
rejected) carries over to 3D, and the divide_subtract/convert_reduce
trace buckets are bandwidth, not waste.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ctseg_tpu.models.layers import instance_norm_prelu  # noqa: E402


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    results = []
    for name, shape in [
        ("fullres_c10", (128, 128, 128, 16, 10)),
        ("halfres_c64", (128, 64, 64, 8, 64)),  # lane-full comparison site
    ]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        alpha = jnp.asarray([0.25], jnp.float32)
        dy = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

        fwd = jax.jit(instance_norm_prelu)

        def fwd_bwd(x_, a_, dy_):
            out, vjp = jax.vjp(instance_norm_prelu, x_, a_)
            return vjp(dy_)

        fb = jax.jit(fwd_bwd)
        floor = jax.jit(
            lambda a, b: jnp.sum(jnp.square(a.astype(jnp.float32)))
            + jnp.sum(jnp.square(b.astype(jnp.float32)))
        )
        gb = x.nbytes / 1e9
        t_f = timeit(fwd, x, alpha)
        t_fb = timeit(fb, x, alpha, dy)
        t_floor = timeit(floor, x, dy)
        row = {
            "site": name, "shape": list(shape), "gb_per_tensor": round(gb, 3),
            "fwd_ms": round(t_f * 1000, 3),
            "fwd_bwd_ms": round(t_fb * 1000, 3),
            "floor_read2_ms": round(t_floor * 1000, 3),
            # fwd traffic ~ read x + write y (2 tensors); fwd+bwd adds
            # write xhat, read xhat x2, read dy, write dx (~7 tensors total)
            "fwd_bw_gbps": round(2 * gb / t_f, 1),
            "fwd_bwd_bw_gbps": round(7 * gb / t_fb, 1),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    with open("perf/in_shallow_v5e.json", "w") as f:
        json.dump(
            {"device": jax.devices()[0].device_kind,
             "what": "InstanceNorm+PReLU fwd / fwd+bwd at the full-res C=10 "
                     "decoder site vs a lane-full site",
             "results": results},
            f, indent=1,
        )


if __name__ == "__main__":
    main()
