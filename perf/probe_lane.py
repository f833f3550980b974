"""Measure HBM streaming bandwidth vs minor-dim (lane) size on this chip.

Why: the per-site roofline (perf/roofline.py) shows the C=64 UNet levels at
0.45-0.58 of the naive HBM bound while C>=128 levels reach 0.7-1.0. TPU
arrays are tiled (8 sublanes, 128 lanes) on the trailing two dims, so one
hypothesis was that a C=64 minor dim halves effective bandwidth. This probe
tests that by streaming y = x * k (1 read + 1 write) with the minor dim
swept over {128, 64, 32}.

Measurement method (two invalid probes diagnosed on the way, kept here as
methodology notes):
  1. A chained-scan probe whose body only used y[0, 0] was dead-code
     eliminated — 'measured' 2000+ GB/s on an 819 GB/s chip.
  2. A scan that carried the full array was defeated differently: XLA
     unrolls the known-trip-count loop and fuses all the elementwise
     multiplies into ONE pass (implied GB/s scaled linearly with chain
     length: 285 -> 910 -> 3683 for chain 4/16/64).
  3. Valid method (this file): two payload sizes per minor dim, a single
     un-chainable pass each, timed over async dispatches with one final
     sync; bandwidth from the SLOPE (t_big - t_small), which cancels the
     ~5-7 ms per-launch tunnel overhead that swamps absolute times.

Result (v5e, 2026-08-17): minor=128: ~750 GB/s (92% of the 819 spec),
minor=64: ~610 GB/s, minor=32: ~820 GB/s. The C=64 penalty is ~18%, not
2x, and minor=32 shows none — XLA's layout assignment avoids catastrophic
lane padding. Conclusion: the shallow-site roofline shortfall is NOT a
tiling tax; it is the pass structure (materialized f32 stats, separate
normalize and backward passes), which perf/measure_fused_norm.py shows
cannot be profitably hand-fused either (Pallas custom calls perturb XLA's
global layout/fusion choices for a net full-step loss).

Run: python perf/probe_lane.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

M = 1024 * 1024
SMALL = 256 * M  # 0.5 GB bf16 payload
BIG = 1024 * M  # 2 GB
REPS = 16


def t_per_call(elems: int, minor: int, reps: int = REPS) -> float:
    x = jnp.ones((elems // minor, minor), jnp.bfloat16)
    f = jax.jit(lambda x: x * jnp.bfloat16(1.0009765625))
    r = f(x)
    r.block_until_ready()
    float(jnp.float32(r[0, 0]))  # tunnel-proof sync (see CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x)
    r.block_until_ready()
    float(jnp.float32(r[0, 0]))
    dt = (time.perf_counter() - t0) / reps
    del x, r
    return dt


def main():
    print(f"{'minor':>6}{'GB/s (slope)':>14}")
    for minor in (128, 64, 32):
        t1 = t_per_call(SMALL, minor)
        t2 = t_per_call(BIG, minor)
        bw = 2 * (BIG - SMALL) * 2 / (t2 - t1) / 1e9
        print(f"{minor:>6}{bw:>14.1f}   (t1={t1 * 1e3:.2f}ms "
              f"t2={t2 * 1e3:.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
