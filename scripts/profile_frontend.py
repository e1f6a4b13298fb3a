#!/usr/bin/env python
"""Stage-level timing of the STA frontend on the current accelerator:
decoder-only vs heads vs host transfer, fp32 vs bf16 heads, batch scaling.

Usage: python scripts/profile_frontend.py [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def ab_gelu_decode(cfg, params, batch, reps):
    """Paired ABBA A/B of cfg.gelu_approx on the device-resident
    decode+heads loop (bench.py's headline measurement). The knob changes
    no parameters, so both arms apply the identical pytree."""
    import dataclasses

    import numpy as np

    import bench

    arms = {}
    for label, approx in (("exact-erf", False), ("tanh-approx", True)):
        c = dataclasses.replace(cfg, gelu_approx=approx)
        print(f"compiling {label} decode loop ...", flush=True)
        dt, flops, src = bench.measure_device_decode(c, params, batch,
                                                     iters=30)
        arms[label] = (c, flops)
        print(f"  first timing {label}: {dt * 1e3:.2f} ms/iter ({src})",
              flush=True)

    def timed(label):
        c, flops = arms[label]
        dt, _, _ = bench.measure_device_decode(c, params, batch, iters=30)
        return dt

    a_ms, b_ms, deltas = [], [], []
    for rep in range(reps):
        a1 = timed("exact-erf")
        b1 = timed("tanh-approx")
        b2 = timed("tanh-approx")
        a2 = timed("exact-erf")
        a, b = (a1 + a2) / 2, (b1 + b2) / 2
        a_ms.append(a * 1e3)
        b_ms.append(b * 1e3)
        deltas.append((b - a) * 1e3)
        print(f"  quad {rep}: exact {a * 1e3:.2f} ms/iter, "
              f"approx {b * 1e3:.2f} ms/iter, delta {(b - a) * 1e3:+.2f} ms",
              flush=True)
    am, bm = np.mean(a_ms), np.mean(b_ms)
    fa, fb = arms["exact-erf"][1], arms["tanh-approx"][1]
    peak = bench.V5E_BF16_PEAK_FLOPS
    print(f"A/B gelu decode+heads (batch {batch}, {reps} ABBA quads): "
          f"exact-erf {am:.2f} ms/iter ({fa / (am / 1e3) / peak * 100:.1f}% "
          f"MFU, {batch / (am / 1e3):.1f} pairs/s) vs tanh-approx {bm:.2f} "
          f"ms/iter ({fb / (bm / 1e3) / peak * 100:.1f}% MFU, "
          f"{batch / (bm / 1e3):.1f} pairs/s); "
          f"paired delta {np.mean(deltas):+.2f} ms/iter")


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.models.sta import STA, STAConfig, init_params_host

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default=None,
                    help="also capture a jax.profiler trace here")
    ap.add_argument("--ab-gelu", action="store_true",
                    help="paired ABBA A/B of exact-erf vs tanh-approx GELU "
                         "on the device-resident decode+heads loop (the "
                         "decoder MLPs pay the same erf epilogue the "
                         "encoder roofline found — BASELINE.md)")
    ap.add_argument("--reps", type=int, default=3, help="ABBA quads")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    model, params = init_params_host(cfg)
    params = jax.device_put(params)

    if args.ab_gelu:
        ab_gelu_decode(cfg, params, args.batch, args.reps)
        return

    rng = np.random.default_rng(0)
    B = args.batch
    f1 = jnp.asarray(rng.standard_normal((B, cfg.num_patches, cfg.enc_dim)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, cfg.num_patches, cfg.enc_dim)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((1,) + cfg.img_size + (3,)), jnp.float32)

    encode = jax.jit(lambda p, x: model.apply(p, x, method=STA.encode))
    decode_only = jax.jit(lambda p, a, b: model.apply(p, a, b, method=STA.decode_pair))
    full = jax.jit(lambda p, a, b: model.apply(p, a, b, method=STA.decode_and_heads))

    def block(tree):
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), tree)

    t_enc = timeit(lambda: block(encode(params, img)), args.iters)
    print(f"encode 1 img:        {t_enc * 1e3:8.1f} ms  ({1 / t_enc:6.1f}/s)")

    t_dec = timeit(lambda: block(decode_only(params, f1, f2)), args.iters)
    print(f"decode-only B={B}:     {t_dec * 1e3:8.1f} ms  ({B / t_dec:6.1f} pairs/s)")

    t_full = timeit(lambda: block(full(params, f1, f2)), args.iters)
    print(f"decode+heads B={B}:    {t_full * 1e3:8.1f} ms  ({B / t_full:6.1f} pairs/s)"
          f"  -> heads cost {1e3 * (t_full - t_dec):.1f} ms")

    out = full(params, f1, f2)
    t_xfer = timeit(lambda: jax.device_get(out), args.iters)
    nbytes = sum(np.asarray(v).nbytes for v in jax.device_get(out).values())
    print(f"device_get outputs:  {t_xfer * 1e3:8.1f} ms  ({nbytes / 1e6:.1f} MB, "
          f"{nbytes / t_xfer / 1e9:.2f} GB/s)")

    t_e2e = timeit(lambda: jax.device_get(full(params, f1, f2)), args.iters)
    print(f"end-to-end B={B}:      {t_e2e * 1e3:8.1f} ms  ({B / t_e2e:6.1f} pairs/s)")

    for b2 in (16, 32):
        fa = jnp.tile(f1, (b2 // B, 1, 1))
        fb = jnp.tile(f2, (b2 // B, 1, 1))
        t = timeit(lambda: block(full(params, fa, fb)), max(args.iters // 2, 3))
        print(f"decode+heads B={b2}:   {t * 1e3:8.1f} ms  ({b2 / t:6.1f} pairs/s)")

    # device-resident per-bucket table (relay RTT amortized inside one
    # fori_loop program; same method as bench.py's MFU measurement)
    import bench

    print("\ndevice-resident decode+heads per SLAM bucket:")
    for b in (1, 2, 4, 8):
        dt, flops, src = bench.measure_device_decode(cfg, params, b, iters=30)
        mfu = flops / dt / bench.V5E_BF16_PEAK_FLOPS
        print(f"  bucket {b}: {dt * 1e3:7.2f} ms/iter  {b / dt:7.1f} pairs/s  "
              f"{dt * 1e3 / b:6.2f} ms/pair  MFU {mfu * 100:5.1f}% ({src})")

    if args.trace_dir:
        print(f"\ncapturing jax.profiler trace to {args.trace_dir} ...")
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                block(full(params, f1, f2))
        print("trace written (inspect with tensorboard or xprof)")


if __name__ == "__main__":
    main()
