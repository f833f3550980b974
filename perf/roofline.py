"""Per-site roofline for the Model L train step on TPU v5e.

For every conv site of the flagship configuration (2D UNet, filters
64..1024, num_res_units=2, batch 128, bf16) this computes the attainable
fwd and fwd+bwd time as max(compute, memory):

  compute = FLOPs / peak_bf16            (MXU bound)
  memory  = HBM bytes / bandwidth        (HBM bound)

and — when run on the TPU — measures each site's actual fwd and fwd+bwd
time (conv + IN + PReLU as trained, f32 stats under bf16 compute, same
shapes as the real step). The output table answers the round-2 open
question: is the measured step within a few % of the architecture's
attainable bound, or is there a specific site with headroom?

Byte accounting (minimum traffic, assuming perfect fusion):
  fwd:  read x once + write normalized activation once (weights negligible)
        + one extra read of the conv output for the IN statistics pass when
          the site's output exceeds VMEM (XLA materializes conv -> stats).
  bwd:  dy read + dx write + (x re-read for dW) + (xhat or x re-read for
        the IN backward), i.e. ~3 activation-sized transfers at Cin==Cout.
  FLOPs: 2*k^2*HWout*Cin*Cout per conv; backward = 2x (dx and dW convs).

Run: python perf/roofline.py [--measure]  (measure needs the TPU)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12  # FLOP/s (consistent with measured 139+ TF/s on-site)
HBM_BW = 819e9  # bytes/s, v5e HBM2
BATCH = 128


def conv_site(name, hw_in, hw_out, cin, cout, k=3, norm_act=True):
    """One conv(+IN+PReLU) site: returns dict with FLOPs and byte counts.

    Useful FLOPs: every input position contributes k^2 taps, so both plain
    and transposed convs count 2*k^2*min(hw_in,hw_out)^2*cin*cout — for a
    stride-2 convT that is hw_in^2 (each OUTPUT position averages k^2/s^2
    taps; the polyphase tap sum equals k^2 per input position). A lowering
    that dilates the input with zeros pays s^2 more MACs than this number.
    """
    hw_mac = min(hw_in, hw_out)
    flops_fwd = 2.0 * k * k * hw_mac * hw_mac * cin * cout * BATCH
    bytes_in = BATCH * hw_in * hw_in * cin * 2  # bf16
    bytes_out = BATCH * hw_out * hw_out * cout * 2
    # fwd minimum: read x, write y. IN stats force one extra read of y
    # (f32 stat reduction fused into the conv epilogue at best; re-read at
    # worst — count the optimistic single pass).
    bytes_fwd = bytes_in + bytes_out + (bytes_out if norm_act else 0)
    # bwd: read dy, write dx, re-read x (dW), re-read residual (IN bwd).
    bytes_bwd = bytes_out * 2 + bytes_in * 2 + (bytes_out if norm_act else 0)
    return {
        "name": name, "hw_in": hw_in, "hw_out": hw_out, "cin": cin,
        "cout": cout, "k": k, "norm_act": norm_act,
        "flops_fwd": flops_fwd, "flops_bwd": 2.0 * flops_fwd,
        "bytes_fwd": float(bytes_fwd), "bytes_bwd": float(bytes_bwd),
    }


def model_l_sites():
    """Every conv of the flagship step (encoder RUs, shortcuts, decoder)."""
    ch = (64, 128, 256, 512, 1024)
    sites = []
    # Encoder: ResidualUnit(stride 2) per level: unit0 strided, unit1, shortcut k=3 strided.
    hw = 256
    cin = 3
    for i, c in enumerate(ch[:4]):
        sites.append(conv_site(f"down{i}.unit0(s2)", hw, hw // 2, cin, c))
        sites.append(conv_site(f"down{i}.unit1", hw // 2, hw // 2, c, c))
        sites.append(conv_site(f"down{i}.shortcut(s2)", hw, hw // 2, cin, c))
        hw //= 2
        cin = c
    # Bottom RU (stride 1, 512 -> 1024) + 1x1 shortcut.
    sites.append(conv_site("bottom.unit0", 16, 16, 512, 1024))
    sites.append(conv_site("bottom.unit1", 16, 16, 1024, 1024))
    sites.append(conv_site("bottom.shortcut(1x1)", 16, 16, 512, 1024, k=1,
                           norm_act=False))
    # Decoder: convT (in = skip + deeper out) + RU(subunits=1).
    ups = [  # (name, hw_in, cin=skip+deep, cout)
        ("up3", 16, 512 + 1024, 256),
        ("up2", 32, 256 + 256, 128),
        ("up1", 64, 128 + 128, 64),
        ("up0", 128, 64 + 64, 10),
    ]
    for name, hw_in, cin_u, cout_u in ups:
        is_top = name == "up0"
        sites.append(
            conv_site(f"{name}.transp(s2)", hw_in, hw_in * 2, cin_u, cout_u)
        )
        sites.append(
            conv_site(f"{name}.ru", hw_in * 2, hw_in * 2, cout_u, cout_u,
                      norm_act=not is_top)
        )
    return sites


def attainable_ms(site):
    fwd = max(site["flops_fwd"] / PEAK_BF16, site["bytes_fwd"] / HBM_BW)
    bwd = max(site["flops_bwd"] / PEAK_BF16, site["bytes_bwd"] / HBM_BW)
    bound = "MXU" if site["flops_fwd"] / PEAK_BF16 >= site["bytes_fwd"] / HBM_BW else "HBM"
    return fwd * 1e3, (fwd + bwd) * 1e3, bound


def measure_site(site, rng, chain=8):
    """Measured fwd and fwd+bwd of conv(+IN+PReLU) at this site's shape.

    On this container's TUNNELED chip, per-dispatch latency (~5-10 ms)
    swamps 1-5 ms kernels, so a naive dispatch-per-iteration microbench
    measures the tunnel, not the chip (observed: 'measured' times 4-9x the
    HBM bound at tiny sites). Here `chain` copies of the unit run serially
    INSIDE one dispatch — each iteration's input is perturbed by a scalar
    derived from the previous output, which defeats CSE and forces a serial
    chain — and the per-iteration time is total/chain.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    hw_in, hw_out = site["hw_in"], site["hw_out"]
    cin, cout, k = site["cin"], site["cout"], site["k"]
    stride = max(hw_in // hw_out, 1)
    transposed = hw_out > hw_in

    x = jnp.asarray(rng.normal(size=(BATCH, hw_in, hw_in, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.02, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    a = jnp.asarray([0.25], jnp.float32)

    def unit(x, w, b, a):
        if transposed:
            y = jax.lax.conv_transpose(
                x, w.astype(x.dtype), strides=(stride, stride),
                padding=[((k - 1) // 2, k - (k - 1) // 2 + stride - 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(stride, stride),
                padding=[((k - 1) // 2,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(x.dtype)
        if not site["norm_act"]:
            return y
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
        xhat = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
        al = a.reshape(()).astype(jnp.float32)
        return jnp.where(xhat >= 0, xhat, al * xhat).astype(y.dtype)

    def chained(x, w, b, a):
        # jax.checkpoint: the scan backward would otherwise store `chain`
        # copies of each iteration's activations (HBM OOM at the big sites);
        # with remat the backward recomputes the body, so one chained
        # fwd+bwd iteration costs 2*fwd + bwd — corrected for below.
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
    ap.add_argument("--measure", action="store_true",
                    help="also time every site on the current accelerator")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--filter", type=str, default=None,
                    help="only sites whose name contains this substring")
    args = ap.parse_args()

    import numpy as np

    rng = np.random.default_rng(0)
    sites = model_l_sites()
    if args.filter:
        sites = [s for s in sites if args.filter in s["name"]]
    rows = []
    tot_att_f, tot_att_fb, tot_m_f, tot_m_fb = 0.0, 0.0, 0.0, 0.0
    hdr = (f"{'site':<22}{'bound':>6}{'att fwd':>9}{'att f+b':>9}"
           + (f"{'meas fwd':>10}{'meas f+b':>10}{'eff':>6}" if args.measure else ""))
    print(hdr)
    for s in sites:
        att_f, att_fb, bound = attainable_ms(s)
        tot_att_f += att_f
        tot_att_fb += att_fb
        row = {**s, "bound": bound, "attain_fwd_ms": att_f,
               "attain_fwdbwd_ms": att_fb}
        line = f"{s['name']:<22}{bound:>6}{att_f:>9.2f}{att_fb:>9.2f}"
        if args.measure:
            m_f, m_fb = measure_site(s, rng)
            tot_m_f += m_f
            tot_m_fb += m_fb
            row.update(meas_fwd_ms=m_f, meas_fwdbwd_ms=m_fb)
            line += f"{m_f:>10.2f}{m_fb:>10.2f}{att_fb / m_fb:>6.2f}"
        rows.append(row)
        print(line, flush=True)
    print("-" * len(hdr))
    total_line = f"{'TOTAL':<22}{'':>6}{tot_att_f:>9.2f}{tot_att_fb:>9.2f}"
    if args.measure:
        total_line += f"{tot_m_f:>10.2f}{tot_m_fb:>10.2f}{tot_att_fb / max(tot_m_fb, 1e-9):>6.2f}"
    print(total_line)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"sites": rows, "attain_fwd_ms": tot_att_f,
                       "attain_fwdbwd_ms": tot_att_fb,
                       "meas_fwd_ms": tot_m_f, "meas_fwdbwd_ms": tot_m_fb},
                      f, indent=2)


if __name__ == "__main__":
    main()
