"""XLA TPU compiler-option sweep over the full Model L train step.

The round-3 roofline (PARITY.md "Round-3 roofline close") attributed the
remaining ~23 ms/step of headroom to XLA's *global* pass structure at the
HBM-bound shallow sites — something kernel insertion cannot fix from
outside the compiler. The one lever left is the compiler's own knobs.

XLA_FLAGS cannot carry TPU flags on this container (the axon client parses
flags locally, where libtpu's flag registry is absent), but per-compile
PJRT `compiler_options` are forwarded to the remote compiler and validated
there — so the sweep runs in ONE process: lower the jitted train step once
per option set and AOT-compile it with the candidate options, then time 20
steps against the default compile. Unknown/invalid options raise at compile
time and are recorded as failures.

Run on the real chip:  python perf/probe_xla_flags.py
Results land in perf/xla_flags_v5e.json.
"""

import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CANDIDATES = {
    "default": None,
    # Scoped VMEM bounds how much vector memory a fusion may claim; larger
    # values let the cost model build deeper epilogue fusions (v5e has
    # 128 MiB VMEM/core; the default scoped budget is far lower).
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # Strength-reduced dots lower some convs to vector reductions; forcing
    # the MXU path can help where the reduced form is bandwidth-bound.
    "no_dot_strength_reduction": {
        "xla_tpu_enable_dot_strength_reduction": "false"
    },
    # Alternative fusion heuristics (names validated by the remote
    # compiler; failures are recorded, not fatal).
    "exp_fusion_cost": {
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"
    },
    "aggressive_opt_barrier": {
        "xla_tpu_sliced_prefetch_max_slices": "8"
    },
}


def build_step():
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.pipeline import DevicePipeline2D
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    on_tpu = jax.devices()[0].platform == "tpu"
    config = TrainConfig(
        filters=(64, 128, 256, 512, 1024),
        num_res_units=2,
        transform_degree=2,
        batch_size=128,
        loss_fx=("Focal", "Dice"),
        exclude_missing=True,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    n = 256
    dataset = PackedDataset2D(
        images=(rng.normal(40, 300, size=(n, 280, 280))).astype(np.float32),
        labels=rng.integers(0, 10, size=(n, 280, 280)).astype(np.uint8),
        indicators=rng.integers(0, 2, size=(n, 9)).astype(np.float32),
    )
    pipeline = DevicePipeline2D(dataset, 128)
    batch = next(pipeline.epoch(jax.random.key(0)))
    return trainer, state, batch, jax.random.key(1)


def time_compiled(compiled, state, batch, key, steps=20):
    # _train_step donates `state`; thread it through like the real loop.
    for _ in range(3):
        state, metrics = compiled(state, batch, key)
    float(metrics["loss/total"])  # full sync (axon block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch, key)
    float(metrics["loss/total"])
    return (time.perf_counter() - t0) / steps * 1e3


def main() -> None:
    trainer, state0, batch, key = build_step()
    lowered = trainer._train_step.lower(state0, batch, key)

    results = {}
    for name, opts in CANDIDATES.items():
        t0 = time.time()
        try:
            compiled = (
                lowered.compile()
                if opts is None
                else lowered.compile(compiler_options=opts)
            )
            # Fresh state per config: donation consumes the input buffers.
            state = jax.tree.map(lambda x: x.copy(), state0)
            ms = round(time_compiled(compiled, state, batch, key), 2)
            results[name] = {
                "ms_per_step": ms,
                "options": opts,
                "compile_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"error": str(e)[:300], "options": opts}
        print(name, "->", results[name].get("ms_per_step",
                                            results[name].get("error")))
    out = REPO / "perf" / "xla_flags_v5e.json"
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
