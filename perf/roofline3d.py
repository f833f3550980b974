"""Per-site roofline for the 3D patch-training step on TPU v5e.

Extends perf/roofline.py's methodology (which closed the 2D MFU question in
round 3) to the 3D bench configuration (bench.py line 2): 3D UNet, filters
64..1024, num_res_units=2, batch 128, (128,128,16) patches, bf16. For every
conv3d(+IN+PReLU) site it computes the attainable fwd and fwd+bwd time as
max(compute, memory):

  compute = FLOPs / peak_bf16            (MXU bound)
  memory  = HBM bytes / bandwidth        (HBM bound)

and with --measure times each site as trained (conv3d + one-pass f32 IN
stats + PReLU, serial in-dispatch chain to defeat the tunnel's per-dispatch
latency — see perf/roofline.py::measure_site for the method notes).

The question this answers: the 3D step measures ~236 ms (MFU 0.394,
BENCH line 2) — is that near the architecture's attainable bound (as the
2D step's 99.5 ms was, at 0.71 of its bound with the gap attributed to
XLA's norm-chain pass structure), or does some 3D site have real headroom?

Run: python perf/roofline3d.py [--measure] [--json perf/roofline3d_v5e.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12  # FLOP/s (perf/roofline.py; consistent with measured)
HBM_BW = 819e9  # bytes/s, v5e HBM2
BATCH = 128


def conv_site(name, vox_in, vox_out, cin, cout, k=3, norm_act=True):
    """One conv3d(+IN+PReLU) site. vox_in/vox_out are (H, W, D) tuples.

    Useful FLOPs: 2 * k^3 * prod(min(in, out) per axis) * cin * cout per
    sample (same min-axis accounting as the 2D roofline — a stride-2
    transposed conv's polyphase tap sum equals k^3 per input position).
    """
    vox_mac = 1
    for a, b in zip(vox_in, vox_out):
        vox_mac *= min(a, b)
    n_in = vox_in[0] * vox_in[1] * vox_in[2]
    n_out = vox_out[0] * vox_out[1] * vox_out[2]
    flops_fwd = 2.0 * (k ** 3) * vox_mac * cin * cout * BATCH
    bytes_in = BATCH * n_in * cin * 2  # bf16
    bytes_out = BATCH * n_out * cout * 2
    # fwd minimum: read x, write y, one extra read of y for the IN stats.
    bytes_fwd = bytes_in + bytes_out + (bytes_out if norm_act else 0)
    # bwd: read dy, write dx, re-read x (dW), re-read residual (IN bwd).
    bytes_bwd = bytes_out * 2 + bytes_in * 2 + (bytes_out if norm_act else 0)
    return {
        "name": name, "vox_in": vox_in, "vox_out": vox_out, "cin": cin,
        "cout": cout, "k": k, "norm_act": norm_act,
        "flops_fwd": flops_fwd, "flops_bwd": 2.0 * flops_fwd,
        "bytes_fwd": float(bytes_fwd), "bytes_bwd": float(bytes_bwd),
    }


def halve(v):
    return tuple(max(1, x // 2) for x in v)


def sites_3d():
    """Every conv of the 3D bench step (encoder RUs, shortcuts, decoder)."""
    ch = (64, 128, 256, 512, 1024)
    sites = []
    vox = (128, 128, 16)
    cin = 1
    for i, c in enumerate(ch[:4]):
        vo = halve(vox)
        sites.append(conv_site(f"down{i}.unit0(s2)", vox, vo, cin, c))
        sites.append(conv_site(f"down{i}.unit1", vo, vo, c, c))
        # The projection shortcut is a bare strided conv (no IN/PReLU):
        # models/layers.py::ResidualBlock "shortcut".
        sites.append(conv_site(f"down{i}.shortcut(s2)", vox, vo, cin, c,
                               norm_act=False))
        vox = vo
        cin = c
    # Bottom RU (stride 1, 512 -> 1024) + 1x1 shortcut at (8, 8, 1).
    sites.append(conv_site("bottom.unit0", vox, vox, 512, 1024))
    sites.append(conv_site("bottom.unit1", vox, vox, 1024, 1024))
    sites.append(conv_site("bottom.shortcut(1x1)", vox, vox, 512, 1024,
                           k=1, norm_act=False))
    # Decoder: convT (in = skip + deeper out) + RU(subunits=1).
    ups = [  # (name, vox_in, cin=skip+deep, cout)
        ("up3", (8, 8, 1), 512 + 1024, 256),
        ("up2", (16, 16, 2), 256 + 256, 128),
        ("up1", (32, 32, 4), 128 + 128, 64),
        ("up0", (64, 64, 8), 64 + 64, 10),
    ]
    for name, vox_in, cin_u, cout_u in ups:
        vo = tuple(x * 2 for x in vox_in)
        is_top = name == "up0"
        sites.append(conv_site(f"{name}.transp(s2)", vox_in, vo, cin_u, cout_u))
        sites.append(conv_site(f"{name}.ru", vo, vo, cout_u, cout_u,
                               norm_act=not is_top))
    return sites


def attainable_ms(site):
    fwd = max(site["flops_fwd"] / PEAK_BF16, site["bytes_fwd"] / HBM_BW)
    bwd = max(site["flops_bwd"] / PEAK_BF16, site["bytes_bwd"] / HBM_BW)
    bound = (
        "MXU"
        if site["flops_fwd"] / PEAK_BF16 >= site["bytes_fwd"] / HBM_BW
        else "HBM"
    )
    return fwd * 1e3, (fwd + bwd) * 1e3, bound


def measure_site(site, rng, chain=8):
    """Measured fwd and fwd+bwd of conv3d(+IN+PReLU) at this site's shape.

    Serial in-dispatch chain (jax.checkpoint'ed scan) per
    perf/roofline.py::measure_site — the tunneled chip's ~5-10 ms dispatch
    latency would otherwise swamp the small deep sites.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    vin, vout = site["vox_in"], site["vox_out"]
    cin, cout, k = site["cin"], site["cout"], site["k"]
    strides = tuple(max(a // b, 1) for a, b in zip(vin, vout))
    transposed = vout[0] > vin[0]

    x = jnp.asarray(
        rng.normal(size=(BATCH, *vin, cin)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(k, k, k, cin, cout)) * 0.02, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    a = jnp.asarray([0.25], jnp.float32)
    dn = ("NHWDC", "HWDIO", "NHWDC")

    def unit(x, w, b, a):
        if transposed:
            s = strides[0]
            pad = [((k - 1) // 2, k - (k - 1) // 2 + st - 2) for st in
                   (s,) * 3]
            y = jax.lax.conv_transpose(
                x, w.astype(x.dtype), strides=(s,) * 3, padding=pad,
                dimension_numbers=dn,
            ) + b.astype(x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=strides,
                padding=[((k - 1) // 2,) * 2] * 3,
                dimension_numbers=dn,
            ) + b.astype(x.dtype)
        if not site["norm_act"]:
            return y
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2, 3), keepdims=True)
        xhat = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
        al = a.reshape(()).astype(jnp.float32)
        return jnp.where(xhat >= 0, xhat, al * xhat).astype(y.dtype)

    def chained(x, w, b, a):
        @jax.checkpoint
        def body_fn(c, x, w, b, a):
            y = unit(x + c.astype(x.dtype), w, b, a)
            return jnp.mean(y.astype(jnp.float32))

        def body(carry, _):
            c, acc = carry
            m = body_fn(c, x, w, b, a)
            return (1e-30 * m, acc + m), None

        (c, acc), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), None, length=chain
        )
        return acc

    fwd = jax.jit(chained)
    both = jax.jit(jax.value_and_grad(chained, argnums=(0, 1, 2, 3)))

    def t(f, *args, reps=5):
        out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / (reps * chain) * 1e3

    t_fwd = t(fwd, x, w, b, a)
    t_fb_remat = t(both, x, w, b, a)  # = 2*fwd + bwd per iteration
    return t_fwd, t_fb_remat - t_fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--filter", type=str, default=None)
    args = ap.parse_args()

    sites = sites_3d()
    if args.filter:
        sites = [s for s in sites if args.filter in s["name"]]

    rng = None
    if args.measure:
        import numpy as np

        rng = np.random.default_rng(0)

    total_attain = 0.0
    total_meas = 0.0
    rows = []
    hdr = (
        f"{'site':<22} {'bound':>5} {'attain f':>9} {'attain f+b':>10}"
        + (f" {'meas f':>8} {'meas f+b':>9} {'ratio':>6}" if args.measure else "")
    )
    print(hdr)
    for s in sites:
        af, afb, bound = attainable_ms(s)
        s["bound"] = bound
        s["attain_fwd_ms"] = af
        s["attain_fwdbwd_ms"] = afb
        total_attain += afb
        row = f"{s['name']:<22} {bound:>5} {af:>9.3f} {afb:>10.3f}"
        if args.measure:
            mf, mb = measure_site(s, rng)
            s["meas_fwd_ms"] = mf
            s["meas_fwdbwd_ms"] = mf + mb
            total_meas += mf + mb
            row += (
                f" {mf:>8.3f} {mf + mb:>9.3f}"
                f" {(mf + mb) / max(afb, 1e-9):>6.2f}"
            )
        print(row, flush=True)
        rows.append(s)
    print(f"\nattainable step (conv+IN+PReLU sum, fwd+bwd): {total_attain:.1f} ms")
    if args.measure:
        print(f"measured site sum (fwd+bwd): {total_meas:.1f} ms")
    out = {
        "sites": rows,
        "attainable_total_ms": total_attain,
        "measured_total_ms": total_meas if args.measure else None,
        "batch": BATCH,
        "peak_bf16": PEAK_BF16,
        "hbm_bw": HBM_BW,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("written:", args.json)


if __name__ == "__main__":
    main()
