"""In-suite smoke for perf/bench_torch_monai.py — the runnable reference-
stack (PyTorch+MONAI Model L) competitor benchmark behind bench.py's
baseline. Full fidelity needs a CUDA host with monai/albumentations; here
the script's documented fallbacks (torch_unet_oracle model, numpy degree-2
transforms, CPU no-AMP) keep the protocol exercised so it cannot rot.
"""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from perf.bench_torch_monai import (  # noqa: E402
    NumpyDegree2,
    dice_loss,
    focal_loss,
    main,
)


def test_bench_torch_monai_smoke(capsys):
    result = main([
        "--device", "cpu", "--batch", "4", "--raw", "96", "--crop", "64",
        "--filters", "8", "16", "32", "64", "128",
        "--steps", "2", "--warmup", "1", "--workers", "0",
    ])
    assert result["metric"] == "torch_monai_model_l_train_throughput"
    assert result["value"] > 0 and result["ms_per_step"] > 0
    assert result["amp"] is False
    assert np.isfinite(result["final_loss"])
    # one parseable JSON line on stdout (the bench.py output contract)
    import json

    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ]
    assert len(lines) == 1 and json.loads(lines[0])["value"] == result["value"]


def test_torch_losses_match_jax_reference():
    """The script's plain-torch Focal/Dice equal this repo's (already
    MONAI-differential-tested) JAX losses on the same logits/labels."""
    import jax.numpy as jnp

    from ctseg_tpu.losses.segmentation import (
        dice_loss as jax_dice,
        focal_loss as jax_focal,
    )

    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 10, 16, 16)).astype(np.float64)
    labels = rng.integers(0, 10, size=(2, 16, 16))
    t_logits = torch.from_numpy(logits)
    t_labels = torch.from_numpy(labels)
    # JAX losses take channel-last (N, H, W, C)
    j_logits = jnp.asarray(logits.transpose(0, 2, 3, 1))
    j_labels = jnp.asarray(labels)

    np.testing.assert_allclose(
        float(focal_loss(t_logits, t_labels)),
        float(jax_focal(j_logits, j_labels)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(dice_loss(t_logits, t_labels)),
        float(jax_dice(j_logits, j_labels)),
        rtol=1e-10,
    )


def test_numpy_degree2_transform_contract():
    """Shapes/dtypes + windowing math: output channels are the 3 reference
    windows, normalized; crop size honored; mask stays integer labels."""
    t = NumpyDegree2(crop=32, rng=np.random.default_rng(0))
    image = np.full((48, 48), 40.0, np.float32)  # HU == brain level
    mask = np.random.default_rng(1).integers(0, 10, size=(48, 48)).astype(np.uint8)
    img, m = t(image, mask)
    assert img.shape == (3, 32, 32) and img.dtype == torch.float32
    assert m.shape == (32, 32) and m.dtype == torch.int64
    # brain window (80, 40): HU 40 -> 0.5 pre-normalize
    expected = (0.5 - 0.107) / 0.271
    np.testing.assert_allclose(img[0].numpy(), expected, rtol=1e-5)


def test_bench_torch_monai_3d_smoke():
    """--dims 3: the bench.py line-2 volumetric config (CE+Dice, 3D UNet,
    random windowed patches) runs on CPU with tiny overrides."""
    result = main([
        "--device", "cpu", "--dims", "3", "--batch", "2", "--raw", "48",
        "--patch", "32", "32", "16", "--filters", "4", "8", "16", "32", "64",
        "--steps", "2", "--warmup", "1", "--workers", "0",
    ])
    assert result["metric"] == "torch_monai_unet3d_patch_train_throughput"
    assert result["value"] > 0
    assert result["dims"] == 3
    assert np.isfinite(result["final_loss"])
