"""bench.py's analytic UNet FLOPs formula vs an independent jaxpr count.

The MFU figures in bench.py / perf probes stand on `unet_fwd_flops` — an
analytic sum over the UNet's conv sites (reference architecture:
capstone/models/unet.py via MONAI's recursion). If that formula drifts from
the real model (a missed residual shortcut, wrong decoder concat width),
every published MFU is wrong. This pins it against ground truth: trace the
actual flax forward and sum conv FLOPs straight from the jaxpr's
`conv_general_dilated` equations.
"""

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import unet_fwd_flops  # noqa: E402
from ctseg_tpu.models.unet import UNet  # noqa: E402


def _jaxpr_conv_flops(jaxpr) -> float:
    """2 * prod(out_shape) * Cin * prod(kernel_spatial) per conv eqn.

    out_shape includes batch and Cout, so this is exactly
    2 * N * prod(spatial_out) * Cout * Cin * k^nd — MACs x2 — summed over
    every `conv_general_dilated` in the traced forward (closed jaxprs
    recursed so pjit/remat regions are included).
    """
    total = 0.0
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                total += _jaxpr_conv_flops(v.jaxpr)
        if eqn.primitive.name != "conv_general_dilated":
            continue
        dnums = eqn.params["dimension_numbers"]
        out_shape = eqn.outvars[0].aval.shape
        rhs_shape = eqn.invars[1].aval.shape
        cin = rhs_shape[dnums.rhs_spec[1]]
        k_spatial = [rhs_shape[i] for i in dnums.rhs_spec[2:]]
        groups = eqn.params.get("feature_group_count", 1)
        # Transposed convs lower to lhs-dilated convs; taps landing on the
        # inserted zeros are not model FLOPs (exactly a 1/prod(dilation)
        # fraction of taps is nonzero), matching the standard MFU convention
        # and bench.py's per-input-position transposed-conv count.
        lhs_dil = math.prod(eqn.params.get("lhs_dilation") or (1,))
        total += (
            2.0 * math.prod(out_shape) * cin * math.prod(k_spatial)
            / groups / lhs_dil
        )
    return total


CASES = [
    # (spatial_shape, in_ch, channels, num_res_units)
    ((32, 32), 3, (8, 16, 32, 64, 128), 2),
    ((32, 32), 3, (8, 16, 32, 64, 128), 0),
    ((16, 16, 16), 1, (8, 16, 32, 64, 128), 2),
    ((32, 32, 16), 1, (4, 8, 16, 32, 64), 1),
]


@pytest.mark.parametrize("spatial,in_ch,channels,nru", CASES)
def test_analytic_flops_match_traced_model(spatial, in_ch, channels, nru, monkeypatch):
    batch = 2
    # Pin the analytic formula against the un-folded architecture even if
    # the packed depth-fold (off by default; rejected in the full-step A/B)
    # is ever re-enabled: its folded kernel carries deliberate zero taps —
    # implementation cost, not model FLOPs, and MFU counts the latter.
    import ctseg_tpu.ops.shallow_grad as sg

    monkeypatch.setattr(sg, "packed_depth_supported", lambda *a, **k: False)
    model = UNet(out_channels=10, channels=channels, num_res_units=nru)
    x = jnp.zeros((batch, *spatial, in_ch), jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x))

    def fwd(p, x):
        return model.apply(p, x)

    traced = _jaxpr_conv_flops(jax.make_jaxpr(fwd)(params, x).jaxpr)
    analytic = unet_fwd_flops(
        in_channels=in_ch, channels=channels, strides=(2, 2, 2, 2),
        num_res_units=nru, input_shape=spatial, out_channels=10, batch=batch,
    )
    assert traced > 0
    assert analytic == pytest.approx(traced, rel=1e-6), (
        f"analytic {analytic:.3e} vs traced {traced:.3e}"
    )
