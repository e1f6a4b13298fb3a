#!/usr/bin/env python
"""Encoder roofline on the current accelerator: device-resident batch-N
encode loop (amortized, same method as bench.py's decode row), plus a
jax.profiler trace with op-level attribution of where the time goes.

Round-3 verdict item: the encoder was the only device path without a
trace-backed roofline (34.4% MFU batch 1 / 48.5% batch 8 vs the decode's
94.6%). This script produces the missing attribution: which XLA programs
(attention at 197 tokens? LayerNorm chains? patch-embed conv? copies?)
consume the batch-8 step, summed over the captured device timeline.

The reference encoder is `_encode_image` (reference:
vista_slam/sta_model/sta_model.py:163-174) — 24 ViT-Large blocks at 197
tokens, fp32 on A100, no published throughput.

Usage:
  python scripts/profile_encoder.py --batch 8 --trace-dir /tmp/enc_trace
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo root on path)


def _classify(name: str, args: dict) -> str:
    """Bucket a device op into an attribution category.

    Prefers the profiler's own `hlo_category` arg (present on XLA:TPU op
    events — "convolution fusion", "custom fusion", "copy", ...) over
    name-pattern guessing; name patterns are the fallback for events
    without args."""
    cat = args.get("hlo_category")
    if cat:
        return cat
    n = name.lower()
    if "conv" in n:
        return "convolution fusion"
    if n.startswith("copy") or ".copy" in n or "copy" in n:
        return "copy"
    if "transpose" in n:
        return "transpose"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    return "other"


def _source_frame(args: dict) -> str:
    """First repo-owned frame of the op's source stack (falls back to the
    single `source` arg, then '?') — attributes time to model/loss modules
    instead of opaque fusion numbers."""
    stack = args.get("source_stack", "") or args.get("source", "")
    for line in str(stack).splitlines():
        if "/vista_slam_tpu/" in line or "/root/repo/" in line:
            frag = line.strip().rsplit("/", 1)[-1]
            return frag.split(":")[0] + ":" + frag.split(":")[1] \
                if ":" in frag else frag
    first = str(stack).splitlines()[0].strip() if str(stack).strip() else "?"
    return first.rsplit("/", 1)[-1].rsplit(":", 1)[0] if first != "?" else "?"


def attribute_trace(trace_dir: str, top_k: int = 20):
    """Parse the newest .trace.json.gz under trace_dir and print device-side
    op attribution: per-op totals and coarse category shares."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print(f"no .trace.json.gz under {trace_dir}")
        return
    path = paths[-1]
    print(f"\nattributing {path}")
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device pids: process_name metadata mentioning TPU / device
    dev_pids = set()
    op_tids = set()  # (pid, tid) of "XLA Ops" tracks — leaf ops only,
    # excluding the module/step container events that alias the same time
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                dev_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name":
            tname = e.get("args", {}).get("name", "")
            if "XLA Ops" in tname:
                op_tids.add((e.get("pid"), e.get("tid")))
    if not dev_pids:
        print("no TPU device track found in trace (host-only capture?)")
        return

    per_op = defaultdict(lambda: [0.0, 0.0, None])  # dur us, flops, args
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        # while/conditional/call are containers whose body ops are also on
        # the track — counting both would double the loop body
        if name.split(".")[0] in ("while", "conditional", "call"):
            continue
        rec = per_op[name]
        rec[0] += e.get("dur", 0.0)  # us
        args = e.get("args", {}) or {}
        try:
            rec[1] += float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
        if rec[2] is None and args:
            rec[2] = args

    total = sum(r[0] for r in per_op.values())
    if not total:
        print("device track is empty")
        return
    print(f"device busy time in capture: {total / 1e3:.2f} ms "
          f"across {len(per_op)} distinct ops")

    def rate(flops, dur_us):
        return f"{flops / (dur_us * 1e6):7.1f} TF/s" if flops else "          -"

    per_cat = defaultdict(lambda: [0.0, 0.0])
    per_src = defaultdict(lambda: [0.0, 0.0])
    for name, (dur, flops, args) in per_op.items():
        a = args or {}
        c = per_cat[_classify(name, a)]
        c[0] += dur
        c[1] += flops
        s = per_src[_source_frame(a)]
        s[0] += dur
        s[1] += flops
    print("\nby HLO category (of device busy time; TF/s = achieved rate of "
          "the ops carrying model_flops):")
    for cat, (dur, flops) in sorted(per_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms "
              f"{rate(flops, dur)}  {cat}")

    print("\nby source line (first repo frame of the op's source stack):")
    for src, (dur, flops) in sorted(per_src.items(),
                                    key=lambda kv: -kv[1][0])[:top_k]:
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms "
              f"{rate(flops, dur)}  {src}")

    print(f"\ntop {top_k} ops:")
    for name, (dur, flops, args) in sorted(per_op.items(),
                                           key=lambda kv: -kv[1][0])[:top_k]:
        src = _source_frame(args or {})
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms "
              f"{rate(flops, dur)}  {name[:60]}  [{src}]")


def ab_patchify(batch, reps, iters=200):
    """Micro ABBA A/B: the patch embedding as a stride-16 conv (the
    reference formulation; ~9 TF/s on the MXU — BASELINE.md encoder
    roofline) vs PatchifyEmbed's space-to-depth matmul (the shipped
    formulation), identical kernel parameters."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import PatchifyEmbed, STAConfig

    cfg = STAConfig()
    p, d = cfg.patch_size, cfg.enc_dim
    conv = nn.Conv(d, (p, p), strides=(p, p), dtype=jnp.bfloat16,
                   name="patch_embed")
    pe = PatchifyEmbed(d, p, jnp.bfloat16, name="patch_embed")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch,) + cfg.img_size + (3,)),
                      jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), img)

    def loop(mod):
        def run(params, im):
            def body(i, carry):
                im_c, acc = carry
                y = mod.apply(params, im_c)
                return (im_c + (y.sum() * 1e-24).astype(im_c.dtype),
                        acc + y.mean().astype(jnp.float32))

            _, acc = jax.lax.fori_loop(0, iters, body,
                                       (im, jnp.zeros((), jnp.float32)))
            return acc

        return jax.jit(run)

    jconv, jpe = loop(conv), loop(pe)
    gh, gw = cfg.grid
    flops = 2 * batch * gh * gw * p * p * 3 * d  # one projection
    min_dt = flops / bench.V5E_BF16_PEAK_FLOPS

    def timed(fn):
        return bench.device_loop_time(fn, (params, img), iters,
                                      min_dt_per_iter=min_dt)

    jconv(params, img).block_until_ready()
    jpe(params, img).block_until_ready()
    a_us, b_us, deltas = [], [], []
    for rep in range(reps):
        a1, b1, b2, a2 = timed(jconv), timed(jpe), timed(jpe), timed(jconv)
        a, b = (a1 + a2) / 2 * 1e6, (b1 + b2) / 2 * 1e6
        a_us.append(a)
        b_us.append(b)
        deltas.append(b - a)
        print(f"  quad {rep}: conv {a:.1f} us/iter, matmul {b:.1f} us/iter, "
              f"delta {b - a:+.1f} us", flush=True)
    am, bm = np.mean(a_us), np.mean(b_us)
    print(f"A/B patch embed (batch {batch}, {reps} ABBA quads): "
          f"conv {am:.1f} us/iter ({flops / (am / 1e6) / 1e12:.1f} TF/s) vs "
          f"space-to-depth matmul {bm:.1f} us/iter "
          f"({flops / (bm / 1e6) / 1e12:.1f} TF/s); "
          f"paired delta {np.mean(deltas):+.1f} us/iter")


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.models.sta import STA, STAConfig, init_params_host

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace of the device loop "
                         "and print op-level attribution")
    ap.add_argument("--attribute-only", default=None, metavar="DIR",
                    help="skip measurement; just re-attribute an existing "
                         "trace directory")
    ap.add_argument("--gelu-approx", action="store_true",
                    help="tanh-approximate GELU in the MLPs "
                         "(cfg.gelu_approx) instead of the exact erf")
    ap.add_argument("--ab-gelu", action="store_true",
                    help="paired ABBA A/B of exact-erf vs tanh-approx GELU "
                         "(same params, two compiled loops, alternating arm "
                         "order so linear relay drift cancels)")
    ap.add_argument("--reps", type=int, default=2,
                    help="ABBA quads for --ab-gelu")
    ap.add_argument("--ab-patchify", action="store_true",
                    help="micro ABBA A/B of the patch-embed formulations: "
                         "stride-16 nn.Conv vs PatchifyEmbed's "
                         "space-to-depth matmul (same kernel params)")
    args = ap.parse_args()
    if args.attribute_only:
        attribute_trace(args.attribute_only)
        return
    if args.ab_patchify:
        ab_patchify(args.batch, args.reps)
        return

    print(f"devices: {jax.devices()}", flush=True)
    cfg = STAConfig(compute_dtype=jnp.bfloat16,
                    gelu_approx=args.gelu_approx)
    model, params = init_params_host(cfg)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    B = args.batch
    img = jnp.asarray(rng.standard_normal((B,) + cfg.img_size + (3,)),
                      jnp.float32)

    enc_single = jax.jit(lambda p, im: model.apply(
        p, im, method=STA.encode))
    t0 = time.time()
    compiled = enc_single.lower(params, img).compile()
    print(f"compile (single encode, batch {B}): {time.time() - t0:.1f}s",
          flush=True)
    n = cfg.num_patches
    analytic = B * cfg.enc_depth * (
        2 * n * (4 * cfg.enc_dim ** 2) + 2 * 2 * n * n * cfg.enc_dim
        + 2 * 2 * n * cfg.enc_dim ** 2 * cfg.mlp_ratio)
    flops, src = bench._flops_of(compiled, analytic)

    iters = args.iters

    def enc_loop(params, im):
        def body(i, carry):
            im_c, acc = carry
            f = model.apply(params, im_c, method=STA.encode)
            return (im_c + (f.sum() * 1e-24).astype(im_c.dtype),
                    acc + f.mean())

        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (im, jnp.zeros((), jnp.float32)))
        return acc

    jenc = jax.jit(enc_loop)

    if args.ab_gelu:
        # Arm B: same params, tanh-approx GELU. The knob changes no
        # parameters, so both arms apply the identical pytree.
        cfg_b = STAConfig(compute_dtype=jnp.bfloat16, gelu_approx=True)
        model_b = STA(cfg_b)

        def enc_loop_b(params, im):
            def body(i, carry):
                im_c, acc = carry
                f = model_b.apply(params, im_c, method=STA.encode)
                return (im_c + (f.sum() * 1e-24).astype(im_c.dtype),
                        acc + f.mean())

            _, acc = jax.lax.fori_loop(0, iters, body,
                                       (im, jnp.zeros((), jnp.float32)))
            return acc

        jenc_b = jax.jit(enc_loop_b)
        min_dt = iters * flops / bench.V5E_BF16_PEAK_FLOPS

        def timed(fn):
            out = fn(params, img)
            out.block_until_ready()
            t0 = time.time()
            out = fn(params, img)
            out.block_until_ready()
            dt = time.time() - t0
            if dt < min_dt:  # relay async illusion (BASELINE.md caveat)
                np.asarray(fn(params, img))
                t0 = time.time()
                np.asarray(fn(params, img))
                dt = time.time() - t0
            return dt / iters

        # warm both compiles before any timing
        jenc(params, img).block_until_ready()
        jenc_b(params, img).block_until_ready()
        deltas, a_ms, b_ms = [], [], []
        for rep in range(args.reps):
            a1 = timed(jenc)
            b1 = timed(jenc_b)
            b2 = timed(jenc_b)
            a2 = timed(jenc)
            a = (a1 + a2) / 2
            b = (b1 + b2) / 2
            a_ms.append(a * 1e3)
            b_ms.append(b * 1e3)
            deltas.append((b - a) * 1e3)
            print(f"  quad {rep}: exact {a * 1e3:.2f} ms/iter, "
                  f"approx {b * 1e3:.2f} ms/iter, "
                  f"delta {(b - a) * 1e3:+.2f} ms", flush=True)
        am, bm = np.mean(a_ms), np.mean(b_ms)
        print(f"A/B gelu (batch {B}, {args.reps} ABBA quads): "
              f"exact-erf {am:.2f} ms/iter ({flops / (am / 1e3) / bench.V5E_BF16_PEAK_FLOPS * 100:.1f}% MFU) "
              f"vs tanh-approx {bm:.2f} ms/iter ({flops / (bm / 1e3) / bench.V5E_BF16_PEAK_FLOPS * 100:.1f}% MFU); "
              f"paired delta {np.mean(deltas):+.2f} ms/iter")
        return

    dt = bench.device_loop_time(
        jenc, (params, img), iters,
        min_dt_per_iter=flops / bench.V5E_BF16_PEAK_FLOPS)
    mfu = flops / dt / bench.V5E_BF16_PEAK_FLOPS
    print(f"device-resident encode: {dt * 1e3:.2f} ms/iter (batch {B}) -> "
          f"{B / dt:.1f} frames/s, {flops / 1e9:.1f} GFLOP/call ({src}), "
          f"MFU {mfu * 100:.1f}%")

    if args.trace_dir:
        print(f"capturing jax.profiler trace to {args.trace_dir} ...",
              flush=True)
        with jax.profiler.trace(args.trace_dir):
            jenc(params, img).block_until_ready()
        attribute_trace(args.trace_dir)


if __name__ == "__main__":
    main()
