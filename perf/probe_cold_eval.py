"""Cold-start A/B: per-shape vs bucketed compilation in the 3D eval path.

Real PDDCA has one distinct depth per patient, so the pre-bucketing
evaluate_3d_sliding_window compiled one giant sliding-window program per
patient (30-90s each on the tunneled v5e). The bucketing change
(inference/evaluate.py::_bucketed_grid) shares one program per window-grid
bucket. This probe measures the end-to-end wall time of a COLD (fresh
process, no persistent compile cache) evaluate_3d_sliding_window call on a
mixed-depth synthetic dataset, with the old behavior reproduced by
monkeypatching _bucketed_grid to per-shape buckets.

Usage:  python perf/probe_cold_eval.py            # runs both arms
        python perf/probe_cold_eval.py old|new    # one arm (subprocess)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEPTHS = (72, 76, 80, 84, 88, 92)  # 6 distinct depths -> 2 grid buckets
HW = 160
PATCH = (96, 96, 32)
FILTERS = (16, 32, 64, 128, 256)


def run_arm(arm: str) -> dict:
    import numpy as np

    import ctseg_tpu.inference.evaluate as ev
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    if arm == "old":
        from ctseg_tpu.inference.sliding_window import compute_window_grid

        def per_shape(raw_shape_dhw, patch_size, overlap):
            d, h, w = raw_shape_dhw
            hp = tuple(
                max(s, p) for s, p in zip((h, w, d), patch_size)
            )
            return hp, compute_window_grid(hp, patch_size, overlap)

        ev._bucketed_grid = per_shape

    rng = np.random.default_rng(0)
    ds = PackedDataset3D(
        images=[rng.normal(40, 300, size=(d, HW, HW)).astype(np.float32)
                for d in DEPTHS],
        labels=[rng.integers(0, 10, size=(d, HW, HW)).astype(np.uint8)
                for d in DEPTHS],
        indicators=[np.ones(9, np.float32)] * len(DEPTHS),
        spacings=[np.array([3.0, 1.1, 1.1], np.float32)] * len(DEPTHS),
    )
    cfg = TrainConfig(
        filters=FILTERS, num_res_units=2, batch_size=4,
        loss_fx=("CrossEntropy", "Dice"), spatial_dims=3,
        input_shape=PATCH, in_channels=1, compute_dtype="bfloat16",
        volumetric_mode="patch",
    )
    trainer = make_trainer_3d(cfg, mode="patch", patch_size=PATCH)
    state = trainer.init_state()

    t0 = time.perf_counter()
    result = ev.evaluate_3d_sliding_window(
        trainer, state.params, ds, patch_size=PATCH, batch_size=4,
        with_hd95=True,
    )
    wall = time.perf_counter() - t0
    return {
        "arm": arm,
        "cold_eval_wall_s": round(wall, 1),
        "compiled_programs": result["compiled_programs"],
        "vols_per_min_cold": round(result["vols_per_min"], 3),
        "mean_dice": result["mean_dice"],
    }


def main():
    if len(sys.argv) > 1:
        print(json.dumps(run_arm(sys.argv[1])), flush=True)
        return
    out = {
        "device": "TPU v5 lite",
        "what": (
            "cold (fresh process, no persistent cache) 3D eval wall on 6 "
            "mixed-depth volumes: per-shape programs (old) vs window-grid "
            "buckets (new)"
        ),
        "depths": list(DEPTHS),
        "hw": HW,
        "patch": list(PATCH),
        "arms": [],
    }
    for arm in ("old", "new"):
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            REPO + os.pathsep + env.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        r = subprocess.run(
            [sys.executable, __file__, arm],
            capture_output=True, text=True, timeout=3000, env=env,
        )
        lines = r.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(f"arm {arm} produced no output:\n{r.stderr}")
        out["arms"].append(json.loads(lines[-1]))
    a, b = out["arms"]
    out["speedup_cold_wall"] = round(
        a["cold_eval_wall_s"] / b["cold_eval_wall_s"], 2
    )
    print(json.dumps(out, indent=1))
    with open("perf/cold_eval_v5e.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
