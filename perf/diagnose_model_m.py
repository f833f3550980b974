"""Diagnose the synthetic Model M < Model L Dice inversion (VERDICT r3 #6).

EVIDENCE_r3 measured Model L (num_res_units=2, Focal+Dice) at 0.586 mean
test Dice and Model M (num_res_units=1, Focal+Dice+Boundary, weighted
mixup) at 0.537 on the same synthetic 200-epoch recipe, while the
reference's published ordering on real PDDCA is M >= L (Report.pdf
Table 2). This runs the controlled factorial the verdict asked for —
one factor at a time on the same data/seed — plus the two suspected
mechanisms instrumented directly:

  A  ru=2  Focal+Dice            mixup off   (= Model L)
  B  ru=1  Focal+Dice            mixup off   (capacity alone)
  C  ru=1  Focal+Dice            mixup on    (mixup alone)
  D  ru=1  Focal+Dice+Boundary   mixup off   (boundary alone)
  E  ru=1  Focal+Dice+Boundary   mixup on    (= Model M)

Instrumentation:
  - lambda distribution: empirical Beta(0.2, 0.2) draws from the step
    PRNG (the reference draws the same per-batch lambda host-side,
    capstone/training/utils.py:40-44).
  - partner-sampling distribution: weighted_mixup's probability vector
    on real synthetic train batches, vs what the same slices' published
    ANNOTATION_COUNT weighting produces on real-data presence patterns
    (degenerate-sampling check).
  - Model M loss-component magnitudes per epoch (Focal vs Dice vs
    Boundary scale) from the metrics JSONL.

Run on the real chip from /root/repo:
  python perf/diagnose_model_m.py --workspace /tmp/ws_diag [--fast]
Writes perf/model_m_diagnosis.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")

from make_evidence import build_workspace  # noqa: E402

VARIANTS = {
    "A_modelL_ru2_fd": dict(num_res_units=2, loss_fx=("Focal", "Dice"), mixup=False),
    "B_ru1_fd": dict(num_res_units=1, loss_fx=("Focal", "Dice"), mixup=False),
    "C_ru1_fd_mixup": dict(num_res_units=1, loss_fx=("Focal", "Dice"), mixup=True),
    "D_ru1_fdb": dict(
        num_res_units=1, loss_fx=("Focal", "Dice", "Boundary"), mixup=False
    ),
    "E_modelM_ru1_fdb_mixup": dict(
        num_res_units=1, loss_fx=("Focal", "Dice", "Boundary"), mixup=True
    ),
}


def run_variant(ws: Path, name: str, overrides: dict, epochs, filters,
                batch, input_size, log_dir: Path):
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.pipeline import DevicePipeline2D
    from ctseg_tpu.inference.evaluate import evaluate_2d
    from ctseg_tpu.training.logging import MetricLogger
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    train = PackedDataset2D.load(ws / "miccai_2d" / "train_packed.npz")
    valid = PackedDataset2D.load(ws / "miccai_2d" / "valid_packed.npz")
    test = PackedDataset2D.load(ws / "miccai_2d" / "test_packed.npz")
    full = PackedDataset2D.concatenate(train, valid)

    config = TrainConfig(
        filters=filters, transform_degree=2,
        batch_size=min(batch, len(full)), exclude_missing=True,
        epochs=epochs, compute_dtype="bfloat16", input_size=input_size,
        **overrides,
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    logger = MetricLogger(log_dir=log_dir / name, stdout=False)
    t0 = time.time()
    state = trainer.fit(
        state, DevicePipeline2D(full, config.batch_size), None,
        epochs=epochs, logger=logger,
    )
    train_s = time.time() - t0
    logger.close()
    result = evaluate_2d(trainer, state.params, test)
    return {
        "variant": name,
        **{k: (list(v) if isinstance(v, tuple) else v) for k, v in overrides.items()},
        "epochs": epochs,
        "train_seconds": round(train_s, 1),
        "test_mean_dice": result["mean_dice"],
        "test_per_structure_dice": result["per_structure_dice"],
    }


def lambda_stats(n: int = 4096, alpha: float = 0.2):
    """Empirical Beta(alpha, alpha) characterization from the jax PRNG."""
    import jax

    lam = np.asarray(
        jax.random.beta(jax.random.key(0), alpha, alpha, shape=(n,))
    )
    q = np.quantile(lam, [0.05, 0.25, 0.5, 0.75, 0.95])
    return {
        "alpha": alpha,
        "mean": float(lam.mean()),
        "quantiles_5_25_50_75_95": [round(float(x), 4) for x in q],
        "frac_extreme_lam_lt05_or_gt95": float(
            np.mean((lam < 0.05) | (lam > 0.95))
        ),
    }


def partner_sampling_stats(ws: Path, batch: int):
    """weighted_mixup's partner distribution on real synthetic batches.

    Reports per-slice structure-presence counts and the entropy of the
    partner-sampling probability vector relative to uniform — if synthetic
    slices nearly all contain the same structure sets, the inverse-
    annotation-count weighting degenerates toward uniform and the 'rare
    structure oversampling' mechanism that helps on real PDDCA does
    nothing here."""
    import jax.numpy as jnp

    from ctseg_tpu.constants import ANNOTATION_COUNT
    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.training.mixup import structure_presence

    train = PackedDataset2D.load(ws / "miccai_2d" / "train_packed.npz")
    labels = jnp.asarray(train.labels[:batch].astype(np.int32))
    presence = np.asarray(structure_presence(labels))  # (N, 9)

    count = np.asarray(ANNOTATION_COUNT, np.float64)
    indicator = presence * count
    empty = indicator.sum(axis=1, keepdims=True) == 0
    indicator = indicator + empty * count.sum()
    nonzero = (indicator > 0).sum(axis=1)
    prob = 1.0 / (indicator.sum(axis=1) / np.maximum(nonzero, 1))
    prob = prob / prob.sum()

    n = len(prob)
    entropy = float(-(prob * np.log(prob + 1e-12)).sum())
    return {
        "batch": n,
        "structures_present_per_slice_mean": float(presence.sum(axis=1).mean()),
        "structures_present_per_slice_hist": np.bincount(
            presence.sum(axis=1).astype(int), minlength=10
        ).tolist(),
        "partner_prob_entropy": round(entropy, 4),
        "uniform_entropy": round(float(np.log(n)), 4),
        "entropy_ratio_vs_uniform": round(entropy / float(np.log(n)), 4),
        "partner_prob_max_over_min": round(float(prob.max() / prob.min()), 2),
    }


def loss_component_trace(log_dir: Path, name: str):
    """Per-epoch mean loss-component magnitudes from the metrics JSONL."""
    path = log_dir / name / "metrics.jsonl"
    if not path.exists():
        return None
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    keys = sorted(
        k for k in rows[0] if k.startswith("loss/") and k != "loss/total"
    )
    n = len(rows)
    picks = sorted({0, n // 4, n // 2, 3 * n // 4, n - 1})
    return {
        "loss_keys": keys,
        "epoch_samples": [
            {"epoch_frac": round(i / max(n - 1, 1), 2),
             **{k: round(rows[i][k], 4) for k in keys}}
            for i in picks
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/ws_diag")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--out", default="perf/model_m_diagnosis.json")
    args = ap.parse_args()

    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.fast:
        shape, epochs = (24, 96, 96), 2
        filters, batch, input_size = (8, 16, 32, 64, 128), 16, 64
    else:
        shape, epochs = (40, 512, 512), 200
        filters, batch, input_size = (64, 128, 256, 512, 1024), 128, 256

    ws = build_workspace(Path(args.workspace), shape=shape)
    log_dir = Path(args.workspace) / "diag_logs"

    out = {
        "what": (
            "Controlled factorial for the synthetic Model M < Model L "
            "inversion (same data, same seed, one factor at a time) + "
            "lambda / partner-sampling / loss-magnitude instrumentation"
        ),
        "lambda_distribution": lambda_stats(),
        "partner_sampling": partner_sampling_stats(ws, batch),
        "variants": [],
    }
    print(json.dumps(out["partner_sampling"], indent=1), flush=True)

    for name, overrides in VARIANTS.items():
        print(f"variant: {name}", flush=True)
        r = run_variant(
            ws, name, overrides, epochs, filters, batch, input_size, log_dir
        )
        print(json.dumps(r, indent=1), flush=True)
        out["variants"].append(r)

    out["model_m_loss_trace"] = loss_component_trace(
        log_dir, "E_modelM_ru1_fdb_mixup"
    )
    out["model_l_loss_trace"] = loss_component_trace(log_dir, "A_modelL_ru2_fd")

    Path(args.out).write_text(json.dumps(out, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
