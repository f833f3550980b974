"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ctseg_tpu.ops.pallas.instance_norm import (
    fused_instance_norm_prelu,
    reference_instance_norm_prelu,
)
from ctseg_tpu.ops.pallas.preprocess import _jnp_reference, fused_window_normalize


def test_fused_window_normalize(rng):
    x = jnp.asarray(
        rng.integers(-1024, 3000, size=(4, 48, 64)).astype(np.float32)
    )
    out = fused_window_normalize(x, interpret=True)
    ref = _jnp_reference(x)
    assert out.shape == (4, 48, 64, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_instance_norm_prelu_forward(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 16, 32, 16)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)
    out = fused_instance_norm_prelu(x, alpha, True)
    ref = reference_instance_norm_prelu(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_instance_norm_prelu_grad(rng):
    x = jnp.asarray(rng.normal(0.5, 2.0, size=(2, 8, 16, 8)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)

    def loss_fused(x, a):
        return jnp.sum(jnp.square(fused_instance_norm_prelu(x, a, True)) * 0.5)

    def loss_ref(x, a):
        return jnp.sum(jnp.square(reference_instance_norm_prelu(x, a)) * 0.5)

    gx_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(x, alpha)
    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r), rtol=1e-3, atol=1e-5)


def test_fused_instance_norm_prelu_constant_channel_no_nan(rng):
    """One-pass E[x^2]-E[x]^2 rounds NEGATIVE in f32 for a near-constant
    channel with large mean (this constant gives var = -0.125, far below
    -EPS); without the clamp to >= 0 that models/layers.py::instance_norm
    applies, rsqrt(var+eps) is NaN. Regression for the unclamped kernel."""
    x = np.empty((2, 16, 32, 8), np.float32)
    x[..., 0] = 1174.4667844096757  # measured: f32 one-pass var rounds to -0.125
    x[..., 1:] = rng.normal(0.0, 2.0, size=(2, 16, 32, 7))
    x = jnp.asarray(x)
    alpha = jnp.asarray([0.25], jnp.float32)
    out = fused_instance_norm_prelu(x, alpha, True)
    assert np.isfinite(np.asarray(out)).all()
    ref = reference_instance_norm_prelu(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def loss(x, a):
        return jnp.sum(jnp.square(fused_instance_norm_prelu(x, a, True)))

    gx, ga = jax.grad(loss, argnums=(0, 1))(x, alpha)
    assert np.isfinite(np.asarray(gx)).all() and np.isfinite(np.asarray(ga)).all()


def test_fused_instance_norm_prelu_3d(rng):
    """3D (N, D, H, W, C) inputs reshape through the same kernel."""
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 8)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)
    out = fused_instance_norm_prelu(x, alpha, True)
    ref = reference_instance_norm_prelu(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_instance_norm_prelu_streaming(rng, monkeypatch):
    """The STREAMING form (spatially tiled stats/normalize sweeps, used when
    a slab exceeds VMEM) matches the reference for value AND gradients —
    forced here by shrinking the resident budget."""
    import ctseg_tpu.ops.pallas.instance_norm as inorm

    monkeypatch.setattr(inorm, "RESIDENT_BUDGET", 1024)  # force streaming
    x = jnp.asarray(rng.normal(1.0, 2.0, size=(2, 12, 16, 8)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)
    assert not inorm._pick_tile(8, 12, 16)[2]

    out = inorm.fused_instance_norm_prelu(x, alpha, True)
    ref = reference_instance_norm_prelu(x, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def loss_fused(x, a):
        return jnp.sum(jnp.square(inorm.fused_instance_norm_prelu(x, a, True)) * 0.5)

    def loss_ref(x, a):
        return jnp.sum(jnp.square(reference_instance_norm_prelu(x, a)) * 0.5)

    gx_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(x, alpha)
    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r), rtol=1e-3, atol=1e-5)


def test_fused_instance_norm_prelu_bf16(rng):
    """bf16 inputs stay bf16 (no f32 round trip); stats are f32 inside."""
    x32 = rng.normal(0.0, 2.0, size=(2, 8, 16, 8)).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    alpha = jnp.asarray([0.25], jnp.float32)
    out = fused_instance_norm_prelu(x, alpha, True)
    assert out.dtype == jnp.bfloat16
    ref = reference_instance_norm_prelu(x, alpha)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_conv3x3_in_prelu_fused(rng):
    from ctseg_tpu.ops.pallas.conv_fused import (
        conv3x3_in_prelu,
        fusion_supported,
        reference_conv3x3_in_prelu,
    )

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, size=(32,)).astype(np.float32))
    alpha = jnp.asarray([0.25], jnp.float32)
    out = conv3x3_in_prelu(x, w, b, alpha, interpret=True)
    ref = reference_conv3x3_in_prelu(x, w, b, alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    assert fusion_supported((2, 16, 16, 1024), 1024)
    assert not fusion_supported((2, 256, 256, 64), 64)


def test_fused_norm_config_off_tpu_still_normalizes(rng):
    """fused_norm=True off-TPU must fall back to the UNFUSED norm chain —
    the model computes the same function on every backend (regression: the
    backend gate once skipped InstanceNorm entirely, leaving bare PReLU)."""
    from ctseg_tpu.training.trainer import TrainConfig, Trainer

    x = rng.normal(size=(2, 16, 16)).astype(np.float32)
    outs = []
    for fused in (False, True):
        cfg = TrainConfig(
            filters=(4, 8), num_res_units=1, input_size=16,
            transform_degree=0, fused_norm=fused,
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.key(0))
        imgs = jnp.asarray(np.stack([x[0][..., None]] * 2))
        outs.append(np.asarray(tr.model.apply(state.params, imgs)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)
    # and the norm genuinely ran: logits differ from a norm-free model
    assert float(np.abs(outs[1]).max()) > 0


def test_min_plus_kernel_bit_exact_vs_jnp(rng):
    """The Pallas squared-EDT min-plus pass equals the jnp all-pairs
    reduce to f32 BIT equality (same float expression per pair, min is
    rounding-free) across unaligned K/L incl. padding paths. Interpret
    mode here; the same assert ran on the real chip at the eval shape
    before the TPU dispatch was enabled (ops/edt.py::_use_pallas_min_plus)."""
    import jax.numpy as jnp

    from ctseg_tpu.ops.pallas.min_plus import min_plus_2d

    for k_dim, l_dim in [(17, 100), (280, 1030), (8, 8), (96, 128)]:
        x = jnp.asarray(
            rng.uniform(0, 1e6, size=(k_dim, l_dim)).astype(np.float32)
        )
        s = jnp.float32(rng.uniform(0.5, 3.0))
        i = jnp.arange(k_dim, dtype=jnp.float32)
        delta = (i[:, None] - i[None, :]) * s
        ref = jnp.min(delta[:, :, None] ** 2 + x[None], axis=1)
        got = min_plus_2d(x, s, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_edt_pallas_dispatch_flag(rng, monkeypatch):
    """CTSEG_EDT_PALLAS=0/1/auto controls the TPU min-plus dispatch; on
    the CPU test backend auto resolves to the jnp path, and forcing 1
    exercises interpret-incompatible lowering only on real TPU — so here
    we just pin the flag logic."""
    from ctseg_tpu.ops import edt

    import jax

    on_tpu = jax.default_backend() == "tpu"
    monkeypatch.setenv("CTSEG_EDT_PALLAS", "0")
    assert edt._use_pallas_min_plus(True) is False
    monkeypatch.setenv("CTSEG_EDT_PALLAS", "1")
    assert edt._use_pallas_min_plus(False) is on_tpu
    monkeypatch.setenv("CTSEG_EDT_PALLAS", "auto")
    assert edt._use_pallas_min_plus(True) is on_tpu
    assert edt._use_pallas_min_plus(False) is False
