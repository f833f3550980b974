"""Probe: where does the device HD95's ~250 ms/volume go?

After the round-5 eval-loop transfer fixes, the warm in-loop 3D eval is
metric-compute-bound: with_hd95 adds ~1.8-2.5 s per 8-volume chunk
(perf/probe_eval_inloop_v5e.json). hd95_per_structure_device does, per
class (vmapped over 9) and per direction (2): one exact separable EDT
(ops/edt.py — lax.scan lower-envelope passes, latency-suspect on TPU) and
a percentile = TWO 50-iteration full-array masked-count bisections
(metrics/hd95.py::_masked_order_stat_float — bandwidth-suspect).

This times, at the eval bucket shape (280, 280, 32) with anisotropic
spacing, each piece in isolation (serial in-dispatch chain to beat the
tunnel's dispatch latency):

  surfaces_ms      both masks' surface extraction (erosion diffs)
  edt_ms           the 18 EDTs (9 classes x 2 directions), vmapped, on
                   the metric path (Pallas min-plus kernel on TPU)
  edt_jnp_loss_path_ms  the same EDTs on the jnp path the boundary LOSS
                   keeps (the kernel measured 129->222 ms on the full
                   boundary train step and is opt-in per call site)
  percentile_ms    the 36 bisection order stats on precomputed d2
  full_ms          hd95_per_structure_device end-to-end

Run on the real chip: python perf/probe_hd95_cost.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

SHAPE = (280, 280, 32)
CHAIN = 4


def timeit(f, *args, reps=3):
    out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(np.float32))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(np.float32))
    return (time.perf_counter() - t0) / (reps * CHAIN) * 1e3


def chained(fn):
    """Run fn CHAIN times with a data dependency so dispatch amortizes.

    The loop carry must flow INTO the computation's *inputs*, not be added
    to its output — an output-side bias leaves the body loop-invariant and
    XLA hoists the whole metric out of the scan (measured: a first version
    of this probe under-reported by ~4x that way). `fn(*args, carry=c)`
    receives the carry and must mix it into its array inputs via a
    runtime-opaque, value-preserving op (e.g. where(c < 1e20, x, 0))."""

    def run(*args):
        def body(c, _):
            out = fn(*args, carry=c)
            return 1e-30 * out, None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=CHAIN
        )
        return acc

    return jax.jit(run)


def main():
    from ctseg_tpu.metrics.hd95 import (
        _masked_percentile_sqrt,
        _surface_device,
        hd95_per_structure_device,
    )
    from ctseg_tpu.ops.edt import edt_squared
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.integers(0, 10, size=SHAPE).astype(np.int32))
    targ = jnp.asarray(rng.integers(0, 10, size=SHAPE).astype(np.int32))
    spacing = jnp.asarray([1.1, 1.1, 3.0], jnp.float32)
    classes = jnp.arange(1, 10)

    def _mix(x, carry):
        # value-preserving, runtime-opaque dependency on the loop carry
        return jnp.where(carry < jnp.float32(1e20), x, jnp.zeros_like(x))

    def surfaces(pred, targ, carry=0.0):
        pred = _mix(pred, carry)

        def one(c):
            ps = _surface_device(pred == c)
            ts = _surface_device(targ == c)
            return jnp.sum(ps) + jnp.sum(ts)

        return jnp.sum(jax.vmap(one)(classes)).astype(jnp.float32)

    def make_edts(pallas):
        def edts(pred, targ, carry=0.0):
            pred = _mix(pred, carry)

            def one(c):
                ps = _surface_device(pred == c)
                ts = _surface_device(targ == c)
                d2_t = edt_squared(jnp.logical_not(ts), spacing, pallas=pallas)
                d2_p = edt_squared(jnp.logical_not(ps), spacing, pallas=pallas)
                return jnp.sum(d2_t) + jnp.sum(d2_p)

            return jnp.sum(jax.vmap(one)(classes)).astype(jnp.float32)

        return edts

    # Precompute one d2/mask pair per class for the percentile-only probe.
    def make_d2(pred, targ):
        def one(c):
            ps = _surface_device(pred == c)
            ts = _surface_device(targ == c)
            return edt_squared(jnp.logical_not(ts), spacing), ps

        return jax.vmap(one)(classes)

    d2s, masks = jax.jit(make_d2)(pred, targ)
    hi0 = jnp.sum(
        (spacing * jnp.asarray([s - 1 for s in SHAPE], jnp.float32)) ** 2
    )

    def percentiles(d2s, masks, carry=0.0):
        d2s = _mix(d2s, carry)

        def one(d2, m):
            v, n = _masked_percentile_sqrt(d2, m, 95.0, 1, hi0)
            return v

        return jnp.sum(jax.vmap(one)(d2s, masks))

    def full(pred, targ, carry=0.0):
        vals, ok = hd95_per_structure_device(
            _mix(pred, carry), targ, 10, spacing=spacing
        )
        return jnp.sum(vals)

    results = {}
    for name, fn, args in [
        ("surfaces_ms", surfaces, (pred, targ)),
        ("edt_ms", make_edts(True), (pred, targ)),
        ("edt_jnp_loss_path_ms", make_edts(False), (pred, targ)),
        ("percentile_ms", percentiles, (d2s, masks)),
        ("full_ms", full, (pred, targ)),
    ]:
        results[name] = round(timeit(chained(fn), *args), 2)
        print(name, results[name], flush=True)

    out = {
        "device": jax.devices()[0].device_kind,
        "shape": list(SHAPE),
        "what": (
            "device HD95 cost split at the eval bucket shape: surface "
            "extraction, 18 vmapped exact EDTs, 36 bisection order stats, "
            "and the full metric (all per volume, serial-chained)"
        ),
        **results,
        "edt_only_ms_est": round(results["edt_ms"] - results["surfaces_ms"], 2),
    }
    print(json.dumps(out, indent=1))
    with open("perf/hd95_cost_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
