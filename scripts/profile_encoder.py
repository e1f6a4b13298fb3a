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


def _classify(name: str) -> str:
    """Bucket an XLA op/fusion name into a coarse attribution category."""
    n = name.lower()
    if "conv" in n:
        return "conv (patch embed)"
    if "dot" in n or "matmul" in n:
        return "matmul (attn/mlp)"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n \
            or "copy-done" in n:
        return "copy/layout"
    if "transpose" in n:
        return "transpose"
    if "reduce" in n or "norm" in n:
        return "reduce/norm"
    if "fusion" in n:
        return "fusion (elementwise+)"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


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

    per_op = defaultdict(float)
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
        per_op[name] += e.get("dur", 0.0)  # us

    total = sum(per_op.values())
    if not total:
        print("device track is empty")
        return
    print(f"device busy time in capture: {total / 1e3:.2f} ms "
          f"across {len(per_op)} distinct ops")

    per_cat = defaultdict(float)
    for name, dur in per_op.items():
        per_cat[_classify(name)] += dur
    print("\ncategory attribution (of device busy time):")
    for cat, dur in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms  {cat}")

    print(f"\ntop {top_k} ops:")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms  {name[:110]}")


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
    args = ap.parse_args()
    if args.attribute_only:
        attribute_trace(args.attribute_only)
        return

    print(f"devices: {jax.devices()}", flush=True)
    cfg = STAConfig(compute_dtype=jnp.bfloat16)
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
