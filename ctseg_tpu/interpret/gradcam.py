"""GradCAM for segmentation models, pure JAX.

Capability parity with the reference's Captum LayerGradCam driver
(capstone/interpretability.py:85-103): per structure, the spatial-summed
class logit is the scalar target; the attribution at a chosen layer is
ReLU(sum_c pooled_grad_c * activation_c), upsampled to the input size.

Implementation: the UNet exposes named activations through flax's `perturb`
mechanism (an additive zero in the 'perturbations' collection), so the
gradient w.r.t. the perturbation IS the gradient w.r.t. the activation —
no module surgery, no hooks, one extra `jax.grad`.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ctseg_tpu.constants import NUM_STRUCTURES


def _capture_model(model):
    """Clone the model with feature capture enabled."""
    return model.clone(capture_features=True)


def gradcam(
    model,
    params: Dict,
    x: jnp.ndarray,
    class_idx: int,
    layer: str = "feat_down1",
) -> jnp.ndarray:
    """CAM for one class. x: (N, *spatial, C). Returns (N, *spatial) in [0, ~].

    `layer` is one of the captured names: feat_down0..3, feat_bottom,
    feat_up1..3 (decoder), mirroring the reference's choice of an early conv
    layer (interpretability.py:97).
    """
    cmodel = _capture_model(model)
    variables = {"params": params["params"] if "params" in params else params}

    # Structure of the perturbations collection (all zeros).
    pert_shape = jax.eval_shape(
        lambda: cmodel.init(jax.random.key(0), x)["perturbations"]
    )
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pert_shape)

    def score_and_act(pert):
        logits = cmodel.apply({**variables, "perturbations": pert}, x)
        score = jnp.sum(logits[..., class_idx])
        return score

    grads = jax.grad(score_and_act)(zeros)
    grad_act = _find_layer(grads, layer)

    # The activation itself, sown under 'intermediates' next to the perturb.
    logits, state = cmodel.apply(
        {**variables, "perturbations": zeros},
        x,
        mutable=["intermediates"],
    )
    act = _find_intermediate(state["intermediates"], layer)

    pooled = jnp.mean(grad_act, axis=tuple(range(1, grad_act.ndim - 1)), keepdims=True)
    cam = jax.nn.relu(jnp.sum(pooled * act, axis=-1))  # (N, *spatial_layer)
    # Upsample to input spatial size.
    target_shape = (cam.shape[0],) + x.shape[1:-1]
    cam = jax.image.resize(cam, target_shape, method="linear")
    return cam


def _find_layer(tree: Dict, layer: str):
    """Locate `layer` in the (possibly nested) perturbations pytree."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if any(getattr(k, "key", None) == layer for k in path):
            return leaf
    raise KeyError(f"layer {layer!r} not found; available: {list(tree)}")


def _find_intermediate(tree: Dict, layer: str):
    """perturb() sows the activation under intermediates as well."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if any(getattr(k, "key", None) == layer for k in path):
            return leaf[0] if isinstance(leaf, tuple) else leaf
    raise KeyError(f"intermediate {layer!r} not found")


def gradcam_all_structures(
    model, params: Dict, x: jnp.ndarray, layer: str = "feat_down1"
) -> jnp.ndarray:
    """(N, S, *spatial) attribution maps, one per structure (classes 1..9)."""
    cams = [
        gradcam(model, params, x, class_idx=c, layer=layer)
        for c in range(1, NUM_STRUCTURES + 1)
    ]
    return jnp.stack(cams, axis=1)
