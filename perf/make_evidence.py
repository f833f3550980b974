"""Reproducible end-to-end evidence run -> EVIDENCE_r{N}.json (see --out).

Runs the whole demonstration suite on the current hardware (real TPU under
axon; also works on CPU, just slower): synthetic PDDCA-layout patients
through the real split/convert/pack pipeline, the reference's exact Model L
200-epoch full-data recipe with FULL-test-split evaluation (every slice —
the round-1 run silently dropped the trailing partial batch), a Model M
(mixup + boundary-loss) demo, the 3D patch-training + sliding-window
Dice/HD95 path with steady-state vols/min, and the batched GradCAM sweep.

Usage (from /root/repo):  python perf/make_evidence.py [--fast]
--fast shrinks epochs/model for a smoke run (does not overwrite EVIDENCE).
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO_ROOT)


def build_workspace(ws: Path, shape=(40, 512, 512)) -> Path:
    if (ws / "miccai_2d" / "train_packed.npz").exists():
        print("workspace cached:", ws, flush=True)
        return ws
    from ctseg_tpu.data.download import prepare_miccai
    from ctseg_tpu.data.process_miccai import (
        convert_to_2d,
        convert_to_3d,
        pack_2d,
        pack_3d,
    )
    from ctseg_tpu.testing.synth import make_patient

    print("building workspace:", ws, flush=True)
    miccai = ws / "miccai"
    ids = list(range(1, 34)) + list(range(555, 570))
    for i, pid in enumerate(ids):
        make_patient(
            miccai / f"0522c{pid:04d}", shape=shape, seed=i,
            with_landmarks=pid < 480,
        )
    prepare_miccai(str(miccai), download=False)
    # The anatomical crop boundaries assume 512x512 scans; skip the crop for
    # small smoke-run volumes (testing/synth convention, see verify skill).
    crop = shape[1] >= 512
    for split in ("train", "valid", "test"):
        convert_to_2d(miccai, ws / "miccai_2d", split, crop=crop)
        convert_to_3d(miccai, ws / "miccai_3d", split, crop=crop)
    pack_2d(ws / "miccai_2d")
    pack_3d(ws / "miccai_3d")
    return ws


def model_l_full_recipe(ws: Path, epochs: int, filters, batch: int, input_size: int):
    """Reference final-model recipe: train+valid, 200 epochs, test eval
    (capstone/training/base_trainer.py:225-246)."""
    import jax

    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.pipeline import DevicePipeline2D
    from ctseg_tpu.inference.evaluate import evaluate_2d
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    train = PackedDataset2D.load(ws / "miccai_2d" / "train_packed.npz")
    valid = PackedDataset2D.load(ws / "miccai_2d" / "valid_packed.npz")
    test = PackedDataset2D.load(ws / "miccai_2d" / "test_packed.npz")
    full = PackedDataset2D.concatenate(train, valid)

    config = TrainConfig(
        filters=filters, num_res_units=2, transform_degree=2,
        batch_size=min(batch, len(full)), loss_fx=("Focal", "Dice"),
        exclude_missing=True, epochs=epochs, compute_dtype="bfloat16",
        input_size=input_size,
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    pipe = DevicePipeline2D(full, config.batch_size)

    t0 = time.time()
    state = trainer.fit(state, pipe, None, epochs=epochs)
    train_s = time.time() - t0

    result = evaluate_2d(trainer, state.params, test)
    return {
        "what": (
            "Model L end-to-end on the reference's exact final recipe "
            "(train+valid full data, Focal+Dice, exclude_missing, degree-2 "
            "on-device aug, bf16), then FULL-test-split evaluation"
        ),
        "epochs": epochs,
        "seconds_per_epoch": round(train_s / epochs, 3),
        "total_train_seconds": round(train_s, 1),
        "num_test_slices_evaluated": result["num_slices"],
        "num_test_slices_in_split": len(test),
        "test_mean_dice": result["mean_dice"],
        "test_per_structure_dice": result["per_structure_dice"],
    }, (trainer, state, test)


def model_m_demo(ws: Path, epochs: int, filters, batch: int, input_size: int):
    """Model M on the reference's full mixup recipe: weighted mixup +
    Focal+Dice+Boundary (exact on-device EDT), num_res_units=1, train+valid
    full data, then FULL-test-split evaluation
    (capstone/training/mixup_trainer.py:131-190)."""
    import time as _time

    from ctseg_tpu.data.datasets import PackedDataset2D
    from ctseg_tpu.data.pipeline import DevicePipeline2D
    from ctseg_tpu.inference.evaluate import evaluate_2d
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    train = PackedDataset2D.load(ws / "miccai_2d" / "train_packed.npz")
    valid = PackedDataset2D.load(ws / "miccai_2d" / "valid_packed.npz")
    test = PackedDataset2D.load(ws / "miccai_2d" / "test_packed.npz")
    full = PackedDataset2D.concatenate(train, valid)
    config = TrainConfig(
        filters=filters, num_res_units=1, transform_degree=2,
        batch_size=min(batch, len(full)),
        loss_fx=("Focal", "Dice", "Boundary"), exclude_missing=True,
        mixup=True, epochs=epochs, compute_dtype="bfloat16",
        input_size=input_size,
    )
    trainer = Trainer(config)
    state = trainer.init_state()
    t0 = _time.time()
    state = trainer.fit(
        state, DevicePipeline2D(full, config.batch_size), None, epochs=epochs
    )
    train_s = _time.time() - t0
    result = evaluate_2d(trainer, state.params, test)
    return {
        "what": (
            "Model M on the reference's exact mixup recipe (train+valid "
            "full data, weighted mixup, Focal+Dice+Boundary with exact "
            "on-device EDT distance maps, num_res_units=1), then FULL-"
            "test-split evaluation"
        ),
        "epochs": epochs,
        "seconds_per_epoch": round(train_s / epochs, 3),
        "num_test_slices_evaluated": result["num_slices"],
        "test_mean_dice": result["mean_dice"],
        "test_per_structure_dice": result["per_structure_dice"],
    }


def hd95_magnitude_diagnosis(trainer, params, test, patch, max_vols=5):
    """Why do synthetic HD95 values read 80-150 mm when published HaN HD95
    is 2-10 mm? Hypothesis: far-field false-positive connected components
    (specks an undertrained model predicts anywhere in the volume) dominate
    the 95th-percentile surface distance; genuine surface error around the
    true structure is small. Proof: per structure, count predicted
    components and recompute the scipy-oracle HD95 keeping ONLY the largest
    predicted component — if the mm values collapse, the magnitude is
    attributable to specks, not to broken metric math (the metric itself is
    differential-tested against scipy `sampling=` in tests/test_hd95.py)."""
    from scipy import ndimage

    from ctseg_tpu.inference.predict import predict_labels_3d
    from ctseg_tpu.metrics.hd95 import hd95

    per_structure = {i: [] for i in range(1, 10)}
    for vi in range(min(len(test), max_vols)):
        vol = test.images[vi].astype(np.float32)
        gt = test.labels[vi]
        spacing = (
            None if test.spacings is None
            else np.asarray(test.spacings[vi], float)
        )
        pred = predict_labels_3d(
            trainer, params, vol, patch_size=patch, overlap=0.5
        )
        for c in range(1, 10):
            p, t = pred == c, gt == c
            if not p.any() or not t.any():
                continue
            comp, n_comp = ndimage.label(p)
            sizes = ndimage.sum_labels(p, comp, index=range(1, n_comp + 1))
            largest = int(np.argmax(sizes)) + 1
            raw = hd95(p, t, spacing=spacing)
            largest_only = hd95(comp == largest, t, spacing=spacing)
            # Distance of FP voxels (outside GT) to the GT surface, in the
            # same units as HD95 — the far-field evidence.
            dist_to_gt = ndimage.distance_transform_edt(~t, sampling=spacing)
            fp = p & ~t
            per_structure[c].append({
                "n_components": int(n_comp),
                "largest_component_frac": float(sizes[largest - 1] / p.sum()),
                "hd95": float(raw),
                "hd95_largest_component_only": float(largest_only),
                "max_fp_distance": float(dist_to_gt[fp].max()) if fp.any() else 0.0,
            })

    from ctseg_tpu.constants import STRUCTURES

    def agg(rows, k):
        return round(float(np.mean([r[k] for r in rows])), 2) if rows else None

    table = {
        STRUCTURES[c - 1]: {
            "mean_n_components": agg(rows, "n_components"),
            "mean_largest_component_frac": agg(rows, "largest_component_frac"),
            "mean_hd95": agg(rows, "hd95"),
            "mean_hd95_largest_component_only": agg(
                rows, "hd95_largest_component_only"
            ),
            "mean_max_fp_distance": agg(rows, "max_fp_distance"),
        }
        for c, rows in per_structure.items()
    }
    raw_vals = [v["mean_hd95"] for v in table.values() if v["mean_hd95"]]
    lco_vals = [
        v["mean_hd95_largest_component_only"]
        for v in table.values()
        if v["mean_hd95_largest_component_only"]
    ]
    ratio = (
        round(float(np.mean(raw_vals)) / float(np.mean(lco_vals)), 2)
        if raw_vals and lco_vals and np.mean(lco_vals) > 0
        else None
    )
    return {
        "what": (
            "attribution of the large synthetic HD95 magnitudes: predicted "
            "components counted per structure; HD95 recomputed keeping only "
            "the largest predicted component; max distance of false-positive "
            "voxels to the ground-truth surface"
        ),
        "per_structure": table,
        "raw_over_largest_only_hd95_ratio": ratio,
        "attribution": (
            "the tens-of-mm HD95 values on this synthetic, briefly-trained "
            "model come from far-field false-positive components (specks far "
            "from the true structure dominate the 95th-percentile surface "
            "distance); the surface error of the main predicted component is "
            "far smaller, and published HaN HD95 of 2-10 mm corresponds to "
            "converged models on real data where such specks are absent"
        ),
    }


def volumetric_demo(ws: Path, epochs: int, patch, filters):
    from ctseg_tpu.data.datasets import PackedDataset3D
    from ctseg_tpu.inference.evaluate import evaluate_3d_sliding_window
    from ctseg_tpu.training.trainer import TrainConfig
    from ctseg_tpu.volumetric.pipeline3d import PatchPipeline3D
    from ctseg_tpu.volumetric.trainer3d import make_trainer_3d

    train = PackedDataset3D.load(ws / "miccai_3d" / "train_packed.npz")
    test = PackedDataset3D.load(ws / "miccai_3d" / "test_packed.npz")

    config = TrainConfig(
        filters=filters, num_res_units=2, transform_degree=0,
        batch_size=2, loss_fx=("CrossEntropy", "Dice"), spatial_dims=3,
        input_shape=(patch[0], patch[1], patch[2]), in_channels=1,
        epochs=epochs, compute_dtype="bfloat16", volumetric_mode="patch",
    )
    trainer = make_trainer_3d(config, mode="patch", patch_size=patch)
    state = trainer.init_state()
    pipe = PatchPipeline3D(train, config.batch_size, patch_size=patch)
    state = trainer.fit(state, pipe, None, epochs=epochs)
    # Saved for the cold/warm eval-CLI stage (and as a usable artifact).
    trainer.save(ws / "ckpt_3d", state)

    result = evaluate_3d_sliding_window(
        trainer, state.params, test, patch_size=patch, overlap=0.5,
        with_hd95=True,
    )
    # Steady-state device-resident throughput (no per-volume host copies).
    from ctseg_tpu.inference.evaluate import sliding_window_throughput

    steady = sliding_window_throughput(
        trainer, state.params, test, patch_size=patch, overlap=0.5
    )["vols_per_min"]
    return {
        "what": (
            "3D north-star path: native-resolution patch training "
            "(PatchPipeline3D) + whole-volume sliding-window inference with "
            "Gaussian blending + HD95"
        ),
        "epochs": epochs,
        "test_mean_dice": result["mean_dice"],
        "per_structure_hd95": result.get("per_structure_hd95"),
        "hd95_unit": result.get("hd95_unit"),
        "hd95_magnitude_diagnosis": hd95_magnitude_diagnosis(
            trainer, state.params, test, patch
        ),
        "vols_per_min_eval_path_including_compile_and_transfers": result[
            "vols_per_min"
        ],
        "steady_state_vols_per_min_device_resident": steady,
        "num_volumes": result["num_volumes"],
    }


def eval_cold_warm(ws: Path, patch) -> dict:
    """The 3D eval CLI run twice in fresh subprocesses sharing one FRESH
    persistent compile cache: first invocation pays every remote XLA
    compile (the EVIDENCE_r3 'regression' — in-loop compiles dominate the
    cold path on a tunneled chip), second hits the cache. Captures both
    vols/min plus the cache size, so the cold->warm story lives in a
    regenerable artifact instead of prose (PARITY.md's 24x claim)."""
    import os
    import subprocess

    cache = ws / "xla_cache_coldwarm"
    if cache.exists():
        import shutil

        shutil.rmtree(cache)  # the point is a COLD first invocation
    runs = []
    for label in ("cold", "warm"):
        out = ws / f"eval_{label}.json"
        env = dict(
            os.environ,
            CTSEG_COMPILATION_CACHE=str(cache),
            CTSEG_DATA_STORAGE=str(ws),
        )
        t0 = time.time()
        subprocess.run(
            [
                sys.executable, "-m", "ctseg_tpu.inference.evaluate",
                "--checkpoint", str(ws / "ckpt_3d"),
                "--data_dir", str(ws / "miccai_3d"),
                "--split", "test", "--hd95",
                "--patch_size", *map(str, patch),
                "--out", str(out),
            ],
            check=True, env=env, cwd=REPO_ROOT,
        )
        wall = time.time() - t0
        r = json.loads(out.read_text())
        runs.append(
            {
                "invocation": label,
                "vols_per_min": r["vols_per_min"],
                "mean_dice": r["mean_dice"],
                "hd95_unit": r.get("hd95_unit"),
                "cli_wall_s": round(wall, 1),
                "cache_entries_after": len(list(cache.glob("*"))),
            }
        )
    return {
        "what": (
            "evaluate CLI cold vs warm persistent-compile-cache "
            "invocations (fresh cache dir, same chip/data/checkpoint)"
        ),
        "runs": runs,
        "warm_over_cold_vols_per_min": round(
            runs[1]["vols_per_min"] / max(runs[0]["vols_per_min"], 1e-9), 2
        ),
        "note": (
            "vols_per_min is the CLI's in-loop eval rate (windows+metrics); "
            "cli_wall_s is the whole subprocess including the tunnel-bound "
            "checkpoint restore and remote compiles, so it varies with "
            "tunnel latency across sessions"
        ),
    }


def model_m_inversion_note() -> "dict | None":
    """Attach the measured explanation for the synthetic Model M < Model L
    Dice ordering (the reference's published real-PDDCA ordering is M >= L,
    Report.pdf Table 2). Numbers from perf/model_m_diagnosis.py's one-factor
    factorial (same data/seed, 200 epochs each); regenerate with
      python perf/diagnose_model_m.py --workspace /tmp/ws_diag
    """
    path = Path(__file__).parent / "model_m_diagnosis.json"
    if not path.exists():
        return None
    d = json.loads(path.read_text())
    variants = {
        v["variant"]: round(v["test_mean_dice"], 4) for v in d["variants"]
    }
    return {
        "what": (
            "why synthetic Model M (ru=1, Focal+Dice+Boundary, weighted "
            "mixup) scores below Model L (ru=2, Focal+Dice) while the "
            "reference's real-PDDCA ordering is M >= L"
        ),
        "factorial_mean_dice": variants,
        "explanation": (
            "The inversion is the num_res_units 1-vs-2 capacity drop alone: "
            "ru=1 with Model L's losses already loses the full gap "
            f"(A={variants.get('A_modelL_ru2_fd')} vs "
            f"B={variants.get('B_ru1_fd')}), and adding Boundary "
            f"(D={variants.get('D_ru1_fdb')}) or the full Model M recipe "
            f"(E={variants.get('E_modelM_ru1_fdb_mixup')}) moves nothing. "
            "The two mechanisms that make M win on real PDDCA are "
            "structurally absent on the synthetic distribution: weighted "
            "partner sampling degenerates to near-uniform (entropy ratio "
            f"{d['partner_sampling']['entropy_ratio_vs_uniform']} vs "
            "uniform) because synthetic slices average "
            f"{round(d['partner_sampling']['structures_present_per_slice_mean'], 2)} "
            "structures present (real PDDCA's rare-structure imbalance "
            "drives the inverse-annotation weighting), and mixup's "
            "regularization pays off only where overfitting binds (529 real "
            "slices of natural anatomy; not these separable synthetic "
            "shapes — mixup alone LOWERS ru=1 synthetic Dice to "
            f"{variants.get('C_ru1_fd_mixup')}). Not a framework bug: the "
            "mixup train step is pinned against torch bit-for-bit in "
            "tests/test_trajectory_oracle.py."
        ),
        "lambda_distribution": d["lambda_distribution"],
        "partner_sampling": d["partner_sampling"],
    }


def gradcam_demo(trainer, state, test, n_slices: int = 8):
    import jax
    import jax.numpy as jnp

    from ctseg_tpu.interpret.gradcam import gradcam_all_structures
    from ctseg_tpu.models import SegmentationModel
    from ctseg_tpu.transforms.pipelines import batched_transform

    model = SegmentationModel(
        out_channels=10, channels=trainer.model.channels,
        num_res_units=trainer.model.num_res_units,
        dtype=jnp.float32, capture_features=True,
    )
    images = jnp.asarray(test.images[:n_slices], jnp.float32)
    labels = jnp.asarray(test.labels[:n_slices], jnp.int32)
    img_t, _ = batched_transform(
        trainer.test_transform, jax.random.key(0), images, labels
    )
    t0 = time.time()
    cams = gradcam_all_structures(model, state.params, img_t)
    cams.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    cams = gradcam_all_structures(model, state.params, img_t)
    cams.block_until_ready()
    steady_s = time.time() - t0
    return {
        "what": "batched GradCAM: all 9 structure CAMs in one jitted call",
        "batch": n_slices,
        "cam_shape": list(cams.shape),
        "seconds_including_compile": round(compile_s, 2),
        "seconds_steady_state": round(steady_s, 3),
    }


def serving_demo(ws: Path, trainer, state, n_warm: int = 5, crop: bool = True):
    """Warm HTTP serving (inference/serve.py): one real test scan in NRRD
    over loopback HTTP -> segmentation NRRD back, cold then steady-state."""
    import http.client
    import threading

    from ctseg_tpu.inference.serve import SegmentationService
    from ctseg_tpu.inference.serve import serve as build_server

    ckpt = ws / "serve_ckpt"
    trainer.save(ckpt, state)
    service = SegmentationService(ckpt, crop=crop)
    httpd = build_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    patient = sorted((ws / "miccai" / "test").iterdir())[0]
    scan = (patient / "img.nrrd").read_bytes()

    def post():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/segment", body=scan)
        resp = conn.getresponse()
        payload = resp.read()
        conn.close()
        assert resp.status == 200, payload[:200]
        return payload

    t0 = time.time()
    payload = post()
    cold_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_warm):
        post()
    warm_s = (time.time() - t0) / n_warm
    httpd.shutdown()
    return {
        "what": (
            "end-to-end HTTP serving of one real-geometry test scan "
            "(512x512 slices, anatomical crop): NRRD in -> segmentation "
            "NRRD out, incl. host NRRD decode/encode"
        ),
        "scan_shape": list(service.warm_shapes)[0] if service.warm_shapes else None,
        "response_bytes": len(payload),
        "cold_seconds_including_compile": round(cold_s, 2),
        "warm_seconds_per_scan": round(warm_s, 3),
        "warm_scans_per_min": round(60.0 / warm_s, 1),
    }


def export_demo(trainer, state, batch: int = 32, slice_shape=(280, 280)):
    """StableHLO deployment artifact (inference/export.py): export the
    trained slice model at bf16, reload it, measure steady throughput."""
    import tempfile as _tf

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctseg_tpu.inference.export import (
        export_slice_model,
        load_exported,
        save_exported,
    )

    t0 = time.time()
    exported = export_slice_model(
        trainer, state.params, slice_shape=tuple(slice_shape),
        infer_dtype="bfloat16",
    )
    with _tf.TemporaryDirectory() as d:
        path = save_exported(exported, Path(d) / "model.stablehlo")
        artifact_bytes = path.stat().st_size
        fn = load_exported(path)
        export_s = time.time() - t0

        x = jnp.asarray(
            np.random.default_rng(0).normal(40, 300, (batch, *slice_shape)),
            jnp.float32,
        )
        out = fn(x)
        float(jnp.asarray(out).ravel()[0])
        t0 = time.time()
        for _ in range(10):
            out = fn(x)
        float(jnp.asarray(out).ravel()[0])
        ms = (time.time() - t0) / 10 * 1e3
    return {
        "what": (
            "self-contained bf16 StableHLO artifact (weights + windowing + "
            "resize baked in; symbolic batch; runs with pure jax)"
        ),
        "artifact_mb": round(artifact_bytes / 1e6, 1),
        "export_seconds": round(export_s, 1),
        "steady_ms_per_batch": round(ms, 1),
        "ms_per_slice": round(ms / batch, 3),
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="smoke run")
    ap.add_argument("--out", default="EVIDENCE_r4.json")
    ap.add_argument(
        "--workspace", default=None,
        help="persistent workspace dir (cached across runs); default tmp",
    )
    args = ap.parse_args()

    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.fast:
        shape, epochs_l, epochs_m, epochs_3d = (24, 96, 96), 2, 1, 1
        filters = (8, 16, 32, 64, 128)
        batch, patch, input_size = 16, (32, 32, 16), 64
    else:
        shape, epochs_l, epochs_m, epochs_3d = (40, 512, 512), 200, 200, 30
        filters = (64, 128, 256, 512, 1024)
        batch, patch, input_size = 128, (128, 128, 16), 256

    import jax

    evidence = {
        "what": (
            "End-to-end evidence: full demonstration suite on "
            f"{jax.devices()[0].platform} "
            "(synthetic PDDCA-layout data; real data needs network access "
            "unavailable here)"
        ),
        "fast_mode": args.fast,
    }
    import contextlib

    ctx = (
        contextlib.nullcontext(args.workspace)
        if args.workspace
        else tempfile.TemporaryDirectory()
    )
    with ctx as tmp:
        Path(tmp).mkdir(parents=True, exist_ok=True)
        ws = build_workspace(Path(tmp), shape=shape)
        print("stage: model L", flush=True)
        evidence["model_l_200epoch_full_recipe"], handle = model_l_full_recipe(
            ws, epochs_l, filters, batch, input_size
        )
        print(json.dumps(evidence["model_l_200epoch_full_recipe"], indent=1))
        print("stage: model M", flush=True)
        evidence["model_m_mixup_boundary"] = model_m_demo(
            ws, epochs_m, filters, batch, input_size
        )
        print(json.dumps(evidence["model_m_mixup_boundary"], indent=1))
        print("stage: 3D", flush=True)
        evidence["volumetric_3d"] = volumetric_demo(
            ws, epochs_3d, patch, filters
        )
        print(json.dumps(evidence["volumetric_3d"], indent=1))
        print("stage: eval cold/warm cache", flush=True)
        evidence["eval_cold_warm_cache"] = eval_cold_warm(ws, patch)
        print(json.dumps(evidence["eval_cold_warm_cache"], indent=1))
        trainer, state, test = handle
        evidence["gradcam"] = gradcam_demo(trainer, state, test)
        print(json.dumps(evidence["gradcam"], indent=1))
        print("stage: serving", flush=True)
        evidence["serving_http"] = serving_demo(
            ws, trainer, state, crop=not args.fast
        )
        print(json.dumps(evidence["serving_http"], indent=1))
        print("stage: export", flush=True)
        evidence["stablehlo_export"] = export_demo(
            trainer, state,
            slice_shape=(96, 96) if args.fast else (280, 280),
        )
        print(json.dumps(evidence["stablehlo_export"], indent=1))

    note = model_m_inversion_note()
    if note is not None:
        evidence["model_m_vs_l_synthetic_inversion"] = note

    if not args.fast:
        with open(args.out, "w") as f:
            json.dump(evidence, f, indent=1)
        print("written:", args.out)
    else:
        print("fast mode: not writing", args.out)


if __name__ == "__main__":
    main()
