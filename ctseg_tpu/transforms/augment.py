"""On-device data augmentation with explicit PRNG keys.

Replaces the Albumentations CPU pipeline (reference capstone/transforms/
predefined.py:31-105): every op is a pure function of (key, image, label)
running under jit/vmap on device, so augmentation rides the TPU's VPU instead
of dataloader workers. Distributional equivalence with the Albumentations
ops is what matters for training parity (SURVEY.md §7 "Randomness parity");
exact RNG streams are neither possible nor required.

Images are (H, W, C) float, labels (H, W) int. All ops keep shapes static.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def resize(image: jnp.ndarray, size: Tuple[int, int], method: str = "linear"):
    """Resize (H, W, ...) to (size[0], size[1], ...)."""
    out_shape = (size[0], size[1]) + image.shape[2:]
    return jax.image.resize(image, out_shape, method=method)


def resize_image_and_label(image, label, size):
    """Bilinear for the image, nearest for the label (Albumentations Resize)."""
    img = resize(image, size, "linear")
    lab = resize(label.astype(jnp.float32), size, "nearest").astype(label.dtype)
    return img, lab


def _separable_resample(image, label, wy, wx, ny, nx):
    """Apply row/column weight matrices as two einsum passes: (wy, wx) for
    the image, (ny, nx) for the label. Each matrix is (L_out, L_in); the
    image pair is typically bilinear (or exact one-hot) and the label pair
    one-hot, so label values never mix. Runs on the MXU under vmap — a
    vmapped per-sample gather would dominate the whole train step on TPU
    (measured 100+ ms per 128-batch; CLAUDE.md rule 1)."""
    img2 = image if image.ndim == 3 else image[..., None]
    out = jnp.einsum(
        "ih,hwc->iwc", wy, img2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "jw,iwc->ijc", wx, out, preferred_element_type=jnp.float32
    )
    img = out.astype(image.dtype) if image.ndim == 3 else out[..., 0].astype(image.dtype)

    lab32 = jnp.einsum(
        "ih,hw->iw", ny, label.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    lab32 = jnp.einsum(
        "jw,iw->ij", nx, lab32, preferred_element_type=jnp.float32
    )
    return img, lab32.astype(label.dtype)


def random_crop(key, image, label, size: Tuple[int, int]):
    """Uniform random crop to `size` (A.RandomCrop).

    TPU note: implemented as one-hot selection matmuls (crop = S_h @ X @
    S_w^T); selection matrices are exact (0/1), so values are bit-identical
    to slicing.
    """
    h, w = image.shape[0], image.shape[1]
    kh, kw = jax.random.split(key)
    top = jax.random.randint(kh, (), 0, h - size[0] + 1)
    left = jax.random.randint(kw, (), 0, w - size[1] + 1)

    rows = top + jnp.arange(size[0])
    cols = left + jnp.arange(size[1])
    sel_h = (rows[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
    sel_w = (cols[:, None] == jnp.arange(w)[None, :]).astype(jnp.float32)
    return _separable_resample(image, label, sel_h, sel_w, sel_h, sel_w)


def horizontal_flip(key, image, label, p: float = 0.5):
    """Flip the W axis with probability p (A.HorizontalFlip)."""
    do = jax.random.bernoulli(key, p)
    img = jnp.where(do, jnp.flip(image, axis=1), image)
    lab = jnp.where(do, jnp.flip(label, axis=1), label)
    return img, lab


def random_rotate90(key, image, label, p: float = 0.5):
    """Rotate by k*90 degrees, k ~ U{0..3}, applied with probability p
    (A.RandomRotate90). Requires square spatial dims."""
    assert image.shape[0] == image.shape[1], "rot90 needs square inputs"
    kp, kk = jax.random.split(key)
    k = jnp.where(jax.random.bernoulli(kp, p), jax.random.randint(kk, (), 0, 4), 0)

    def rot(x):
        branches = [lambda v, i=i: jnp.rot90(v, k=i, axes=(0, 1)) for i in range(4)]
        return jax.lax.switch(k, branches, x)

    return rot(image), rot(label)


def _solve_affine(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """2x3 affine M with dst = M @ [src, 1] from 3 point pairs."""
    ones = jnp.ones((3, 1), src_pts.dtype)
    A = jnp.concatenate([src_pts, ones], axis=1)  # (3, 3)
    sol = jnp.linalg.solve(A, dst_pts)  # (3, 2)
    return sol.T  # (2, 3)


def _gaussian_blur_1d(x: jnp.ndarray, sigma: float, axis: int) -> jnp.ndarray:
    radius = int(min(3 * sigma, x.shape[axis] - 1))
    t = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    kernel = jnp.exp(-0.5 * (t / sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)
    x_moved = jnp.moveaxis(x, axis, -1)
    padded = jnp.pad(
        x_moved, [(0, 0)] * (x.ndim - 1) + [(radius, radius)], mode="reflect"
    )
    out = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(
        padded.reshape(-1, padded.shape[-1])
    ).reshape(x_moved.shape)
    return jnp.moveaxis(out, -1, axis)


def _reflect_101(coords: jnp.ndarray, length: int) -> jnp.ndarray:
    """Fold coordinates into [0, length-1] by mirror reflection about the
    edge pixels' centers (cv2 BORDER_REFLECT_101 == scipy/jax map_coordinates
    mode='mirror') — the border Albumentations' warps use by default."""
    if length == 1:
        return jnp.zeros_like(coords)
    period = 2.0 * (length - 1.0)
    t = jnp.mod(coords, period)
    return jnp.where(t > length - 1.0, period - t, t)


def _shear_pass_vertical(img, alpha_c, beta_c, ty, order):
    """mid[y, x] = img[alpha*y + beta*x + ty, x] via per-column interpolation
    matmuls (einsum on the MXU; per-pixel gathers are ~100x slower on TPU).
    Out-of-range source rows reflect (REFLECT_101), matching the gather
    path's mode='mirror' and Albumentations' default border."""
    h, w = img.shape[0], img.shape[1]
    y_out = jnp.arange(h, dtype=jnp.float32)
    x_idx = jnp.arange(w, dtype=jnp.float32)
    # coords[x, y_out] = source y for each column
    coords = alpha_c * y_out[None, :] + beta_c * x_idx[:, None] + ty
    coords = _reflect_101(coords, h)
    y_in = jnp.arange(h, dtype=jnp.float32)
    if order == 1:
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - y_in))
    else:
        idx = jnp.round(coords)
        wgt = (idx[..., None] == y_in).astype(jnp.float32)
    # (x, y_out, y_in) x (y_in, x, c) -> (y_out, x, c)
    if img.ndim == 3:
        return jnp.einsum("xoy,yxc->oxc", wgt, img,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("xoy,yx->ox", wgt, img,
                      preferred_element_type=jnp.float32)


def _shear_pass_horizontal(img, gamma_c, delta_c, tx, order):
    """out[y, x] = img[y, gamma*x + delta*y + tx] via per-row matmuls.
    Out-of-range source columns reflect (REFLECT_101), as in the vertical
    pass."""
    h, w = img.shape[0], img.shape[1]
    x_out = jnp.arange(w, dtype=jnp.float32)
    y_idx = jnp.arange(h, dtype=jnp.float32)
    coords = gamma_c * x_out[None, :] + delta_c * y_idx[:, None] + tx  # (y, x_out)
    coords = _reflect_101(coords, w)
    x_in = jnp.arange(w, dtype=jnp.float32)
    if order == 1:
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - x_in))
    else:
        idx = jnp.round(coords)
        wgt = (idx[..., None] == x_in).astype(jnp.float32)
    # (y, x_out, x_in) x (y, x_in, c) -> (y, x_out, c)
    if img.ndim == 3:
        return jnp.einsum("yoi,yic->yoc", wgt, img,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("yoi,yi->yo", wgt, img,
                      preferred_element_type=jnp.float32)


def _affine_warp_two_pass(image, label, Minv, binv):
    """Exact affine resampling out[p] = in[Minv @ p + binv] via an LU shear
    decomposition: a vertical pass (y' = a*y + b*x) then a horizontal pass
    (x' = g*x + d*y), each an interpolation matmul. (y, x) coordinate order.

    Minv rows/cols ordered (y, x). Precondition: Minv[1, 1] != 0 — the
    decomposition divides by it (beta = m01/m11). True for any near-identity
    affine; the jittered-corner affines here are bounded perturbations of I.
    A caller with a rotation-like map (m11 ~ 0) must pre-compose a rot90.

    Borders: each pass reflects its 1D source coordinate (REFLECT_101).
    In-range pixels are exact; in border bands this equals composed
    REFLECT_101 resampling up to the shear cross terms (|b|, |d| << 1 for
    the bounded affines used here).
    """
    # Composition: mid[q] = in[V q + tv] (vertical), out[p] = mid[H p + th]
    # (horizontal), so src = (V H) p + V th + tv with V = [[a, b], [0, 1]],
    # H = [[1, 0], [d, g]]. Matching V H = Minv and V th + tv = binv:
    m00, m01 = Minv[0, 0], Minv[0, 1]
    m10, m11 = Minv[1, 0], Minv[1, 1]
    delta_c = m10
    gamma_c = m11
    beta_c = m01 / m11
    alpha_c = m00 - beta_c * m10
    tx = binv[1]
    ty = binv[0] - beta_c * binv[1]

    mid_img = _shear_pass_vertical(image, alpha_c, beta_c, ty, order=1)
    out_img = _shear_pass_horizontal(mid_img, gamma_c, delta_c, tx, order=1)
    mid_lab = _shear_pass_vertical(label.astype(jnp.float32), alpha_c, beta_c,
                                   ty, order=0)
    out_lab = _shear_pass_horizontal(mid_lab, gamma_c, delta_c, tx, order=0)
    return out_img.astype(image.dtype), out_lab.astype(label.dtype)


def elastic_transform(
    key,
    image,
    label,
    alpha: float = 1.0,
    sigma: float = 50.0,
    alpha_affine: float = 50.0,
    p: float = 0.5,
):
    """Elastic deformation (Simard 2003 as popularized by A.ElasticTransform):
    a random affine from jittered corner points plus a Gaussian-smoothed
    random displacement field. Bilinear for the image, nearest for labels.

    TPU fast path: at Albumentations defaults the smoothed displacement is
    sub-pixel (sigma=50 attenuates U(-1,1) noise ~300x, so alpha=1 moves
    points by ~0.003 px) — the observable warp is the random affine. When
    `alpha < sigma/10` the affine is applied EXACTLY via two shear-
    decomposed interpolation-matmul passes (MXU) and the field is skipped;
    otherwise the general gather-based resampling runs (slow on TPU).
    """
    h, w = image.shape[0], image.shape[1]
    k_apply, k_aff, k_dx, k_dy = jax.random.split(key, 4)

    # Random affine: perturb a centered triangle of anchor points.
    center = jnp.array([w // 2, h // 2], jnp.float32)
    square = min(h, w) // 3
    src_pts = jnp.stack(
        [
            center + jnp.array([square, square], jnp.float32),
            center + jnp.array([square, -square], jnp.float32),
            center + jnp.array([-square, square], jnp.float32),
        ]
    )
    jitter = jax.random.uniform(
        k_aff, (3, 2), jnp.float32, -alpha_affine, alpha_affine
    )
    M = _solve_affine(src_pts, src_pts + jitter)  # dst <- src mapping, (x, y)

    # Invert: for each output pixel find the source location.
    A = M[:, :2]
    b = M[:, 2]
    Ainv = jnp.linalg.inv(A)

    if alpha < sigma / 10.0:  # displacement field is sub-pixel: affine-only
        # Reorder the inverse map from (x, y) to (y, x) for the shear passes.
        Minv_yx = jnp.array(
            [[Ainv[1, 1], Ainv[1, 0]], [Ainv[0, 1], Ainv[0, 0]]]
        )
        binv_yx = jnp.array(
            [
                -(Ainv[1, 0] * b[0] + Ainv[1, 1] * b[1]),
                -(Ainv[0, 0] * b[0] + Ainv[0, 1] * b[1]),
            ]
        )
        img_w, lab_w = _affine_warp_two_pass(image, label, Minv_yx, binv_yx)
    else:
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        src_x = Ainv[0, 0] * (xs - b[0]) + Ainv[0, 1] * (ys - b[1])
        src_y = Ainv[1, 0] * (xs - b[0]) + Ainv[1, 1] * (ys - b[1])

        # Gaussian-smoothed displacement field.
        dx = jax.random.uniform(k_dx, (h, w), jnp.float32, -1.0, 1.0)
        dy = jax.random.uniform(k_dy, (h, w), jnp.float32, -1.0, 1.0)
        dx = _gaussian_blur_1d(_gaussian_blur_1d(dx, sigma, 0), sigma, 1) * alpha
        dy = _gaussian_blur_1d(_gaussian_blur_1d(dy, sigma, 0), sigma, 1) * alpha
        coord_y = src_y + dy
        coord_x = src_x + dx

        def warp(img2d, order):
            return map_coordinates(
                img2d, [coord_y, coord_x], order=order, mode="mirror"
            )

        img_w = jnp.stack(
            [warp(image[..., c], 1) for c in range(image.shape[-1])], axis=-1
        )
        lab_w = warp(label.astype(jnp.float32), 0).astype(label.dtype)

    do = jax.random.bernoulli(k_apply, p)
    return (
        jnp.where(do, img_w, image),
        jnp.where(do, lab_w, label),
    )


def _distortion_map(key, length: int, num_steps: int, distort_limit: float):
    """Piecewise-linear source-coordinate map (A.GridDistortion).

    Usually monotone, but NOT guaranteed: when the accumulated per-cell
    stretch exceeds the axis length, the forced final segment (cur =
    length) folds backwards over the last partial cell — exactly like
    Albumentations' own map, whose fold-back this reproduces. Do not
    assume invertibility."""
    steps = 1.0 + jax.random.uniform(
        key, (num_steps + 1,), jnp.float32, -distort_limit, distort_limit
    )
    step = length // num_steps
    segments = []
    prev = jnp.float32(0.0)
    start = 0
    for idx in range(num_steps + 1):
        if start >= length:
            break
        end = min(start + step, length)
        if end == length and start + step > length:
            cur = jnp.float32(length)
        else:
            cur = prev + step * steps[idx]
        n = end - start
        # Endpoint-INCLUSIVE, matching Albumentations' np.linspace(prev, cur,
        # n): the cell's last pixel reaches cur, which the next cell's first
        # pixel then duplicates.
        if n > 1:
            seg = prev + (cur - prev) * jnp.arange(n, dtype=jnp.float32) / (n - 1)
        else:
            seg = jnp.full((1,), prev, jnp.float32)
        segments.append(seg)
        prev = cur
        start = end
    return jnp.concatenate(segments)[:length]


def _bilinear_matrix(coords: jnp.ndarray, length: int) -> jnp.ndarray:
    """(L_out, L_in) hat-function weights: row i interpolates at coords[i].

    Exactly order-1 map_coordinates for in-range coords; edge-clamped.
    """
    coords = jnp.clip(coords, 0.0, length - 1.0)
    k = jnp.arange(length, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - k[None, :]))


def _nearest_matrix(coords: jnp.ndarray, length: int) -> jnp.ndarray:
    idx = jnp.clip(jnp.round(coords), 0, length - 1)
    return (idx[:, None] == jnp.arange(length)[None, :]).astype(jnp.float32)


def grid_distortion(
    key,
    image,
    label,
    num_steps: int = 5,
    distort_limit: float = 0.3,
    p: float = 0.5,
):
    """Grid distortion: each grid cell is stretched/compressed by a random
    factor along each axis (A.GridDistortion defaults).

    The distortion is separable by construction, so the resampling runs as
    two interpolation matmuls on the MXU (W_y @ X @ W_x^T) instead of a
    per-pixel gather (map_coordinates gathers dominate TPU step time).
    """
    h, w = image.shape[0], image.shape[1]
    k_apply, kx, ky = jax.random.split(key, 3)
    map_x = _distortion_map(kx, w, num_steps, distort_limit)  # (W,)
    map_y = _distortion_map(ky, h, num_steps, distort_limit)  # (H,)

    img_w, lab_w = _separable_resample(
        image,
        label,
        _bilinear_matrix(map_y, h),
        _bilinear_matrix(map_x, w),
        _nearest_matrix(map_y, h),
        _nearest_matrix(map_x, w),
    )

    do = jax.random.bernoulli(k_apply, p)
    return jnp.where(do, img_w, image), jnp.where(do, lab_w, label)


def one_of(key, ops, image, label):
    """Apply exactly one of `ops` chosen uniformly (A.OneOf with p=0.5 handled
    by the member ops' own p)."""
    k_pick, k_op = jax.random.split(key)
    choice = jax.random.randint(k_pick, (), 0, len(ops))
    branches = [
        functools.partial(lambda op, k, im, lb: op(k, im, lb), op) for op in ops
    ]
    return jax.lax.switch(choice, branches, k_op, image, label)
