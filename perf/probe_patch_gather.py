"""Probe: random 3D patch extraction strategies on v5e.

PatchPipeline3D._sample draws `batch` (volume, corner) pairs and gathers
(ph, pw, pd) patches from the stacked volume array. The shipped form —
vmap over per-sample `images[i]` + 3D dynamic_slice — measured 39.5 ms/step
at batch 128 (bench.py breakdown), ~14% of the 3D train loop, i.e. ~7 GB/s
effective for a ~270 MB copy. This measures alternatives:

  a. vmap_nested : images[i] then 3D dynamic_slice (shipped form)
  b. vmap_4d     : one 4D dynamic_slice on the stacked (V,H,W,D) array
  c. scan_dma    : lax.fori_loop, per-sample dynamic_slice +
                   dynamic_update_slice (sequential DMA copies)
  d. onehot_mm   : selection matmuls (CLAUDE.md rule 1's usual fix):
                   rows via one-hot over (V*H), then W, then D contractions

All variants must be bit-identical to (a). Run on the real chip:
  python perf/probe_patch_gather.py
Writes perf/patch_gather_v5e.json.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BATCH = 128
PATCH = (128, 128, 16)
VOLS, H, W, DMAX = 4, 280, 280, 120


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.normal(40, 300, size=(VOLS, H, W, DMAX)).astype(np.float32)
    )
    labels = jnp.asarray(
        rng.integers(0, 10, size=(VOLS, H, W, DMAX)).astype(np.int32)
    )
    ph, pw, pd = PATCH
    vol_idx = jnp.asarray(rng.integers(0, VOLS, size=BATCH), jnp.int32)
    top = jnp.asarray(rng.integers(0, H - ph + 1, size=BATCH), jnp.int32)
    left = jnp.asarray(rng.integers(0, W - pw + 1, size=BATCH), jnp.int32)
    front = jnp.asarray(rng.integers(0, DMAX - pd + 1, size=BATCH), jnp.int32)
    return images, labels, vol_idx, top, left, front


def vmap_nested(images, labels, vol_idx, top, left, front):
    ph, pw, pd = PATCH

    def gather(i, t, l, f):
        start = (t, l, f)
        return (
            jax.lax.dynamic_slice(images[i], start, (ph, pw, pd)),
            jax.lax.dynamic_slice(labels[i], start, (ph, pw, pd)),
        )

    return jax.vmap(gather)(vol_idx, top, left, front)


def vmap_4d(images, labels, vol_idx, top, left, front):
    ph, pw, pd = PATCH

    def gather(i, t, l, f):
        img = jax.lax.dynamic_slice(images, (i, t, l, f), (1, ph, pw, pd))
        lab = jax.lax.dynamic_slice(labels, (i, t, l, f), (1, ph, pw, pd))
        return img[0], lab[0]

    return jax.vmap(gather)(vol_idx, top, left, front)


def scan_dma(images, labels, vol_idx, top, left, front):
    ph, pw, pd = PATCH
    out_i = jnp.zeros((BATCH, ph, pw, pd), images.dtype)
    out_l = jnp.zeros((BATCH, ph, pw, pd), labels.dtype)

    def body(b, carry):
        oi, ol = carry
        start = (vol_idx[b], top[b], left[b], front[b])
        img = jax.lax.dynamic_slice(images, start, (1, ph, pw, pd))
        lab = jax.lax.dynamic_slice(labels, start, (1, ph, pw, pd))
        oi = jax.lax.dynamic_update_slice(oi, img, (b, 0, 0, 0))
        ol = jax.lax.dynamic_update_slice(ol, lab, (b, 0, 0, 0))
        return oi, ol

    return jax.lax.fori_loop(0, BATCH, body, (out_i, out_l))


def onehot_mm(images, labels, vol_idx, top, left, front):
    """Selection matmuls; labels ride as f32 then round back (values <16)."""
    ph, pw, pd = PATCH
    ar_h = jnp.arange(H, dtype=jnp.int32)
    ar_w = jnp.arange(W, dtype=jnp.int32)
    ar_d = jnp.arange(DMAX, dtype=jnp.int32)
    # rows: one-hot over the flattened (V*H) axis picks volume AND row
    row_ids = vol_idx[:, None] * H + (top[:, None] + jnp.arange(ph)[None, :])
    sel_vh = jax.nn.one_hot(row_ids, VOLS * H, dtype=jnp.float32)  # (B,ph,VH)
    sel_w = (
        (left[:, None, None] + jnp.arange(pw)[None, :, None]) == ar_w
    ).astype(jnp.float32)  # (B,pw,W)
    sel_d = (
        (front[:, None, None] + jnp.arange(pd)[None, :, None]) == ar_d
    ).astype(jnp.float32)  # (B,pd,D)

    def extract(vol_flat):
        rows = jnp.einsum("biV,VWD->biWD", sel_vh, vol_flat)
        cols = jnp.einsum("bjW,biWD->bijD", sel_w, rows)
        return jnp.einsum("bkD,bijD->bijk", sel_d, cols)

    img = extract(images.reshape(VOLS * H, W, DMAX))
    lab = extract(labels.astype(jnp.float32).reshape(VOLS * H, W, DMAX))
    return img, jnp.round(lab).astype(labels.dtype)


def timeit(fn, args, steps=20):
    out = fn(*args)
    float(jnp.asarray(out[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.asarray(out[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    from ctseg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    args = make_data()
    ph, pw, pd = PATCH
    out_bytes = BATCH * ph * pw * pd * 4 * 2  # f32 img + i32 lab

    ref = None
    results = []
    for name, fn in [
        ("vmap_nested", vmap_nested),
        ("vmap_4d", vmap_4d),
        ("scan_dma", scan_dma),
        ("onehot_mm", onehot_mm),
    ]:
        jitted = jax.jit(fn)
        img, lab = jitted(*args)
        img, lab = np.asarray(img), np.asarray(lab)
        if ref is None:
            ref = (img, lab)
            exact = True
        else:
            exact = bool((img == ref[0]).all() and (lab == ref[1]).all())
        t = timeit(jitted, args)
        r = {
            "variant": name,
            "ms": round(t * 1000, 3),
            "effective_gb_per_s": round(out_bytes * 2 / t / 1e9, 1),
            "bit_identical_to_vmap_nested": exact,
        }
        print(json.dumps(r), flush=True)
        results.append(r)

    with open("perf/patch_gather_v5e.json", "w") as f:
        json.dump({
            "device": jax.devices()[0].device_kind,
            "batch": BATCH,
            "patch": list(PATCH),
            "stack_shape": [VOLS, H, W, DMAX],
            "output_mb": round(out_bytes / 1e6, 1),
            "results": results,
        }, f, indent=1)


if __name__ == "__main__":
    main()
