#!/usr/bin/env python
"""Compile + runtime cost of the full-size windowed PGO program on the
current accelerator (production buffer sizes: 4800 nodes / 5200 edges).

Usage: python scripts/profile_pgo.py [--nodes 4800] [--edges 5200]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.slam import host_math as hm
    from vista_slam_tpu.slam.pgo import PGOConfig, optimize_pose_graph

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4800)
    ap.add_argument("--edges", type=int, default=5200)
    ap.add_argument("--real", type=int, default=2000,
                    help="number of real (non-padding) nodes")
    ap.add_argument("--factor-precision", default=None,
                    choices=["default", "high", "highest"],
                    help="dense-factorization matmul precision override")
    ap.add_argument("--factor-refine", type=int, default=None,
                    help="iterative-refinement passes override")
    ap.add_argument("--chol-panel", type=int, default=None,
                    help="blocked-cholesky panel override; a value >= the "
                         "window dim falls back to XLA's monolithic cholesky")
    ap.add_argument("--solver", default=None,
                    choices=["auto", "dense", "pcg"],
                    help="linear-solver override (PGOConfig.solver)")
    ap.add_argument("--pcg-precond", default=None,
                    choices=["tridiag", "jacobi"],
                    help="PCG preconditioner override")
    ap.add_argument("--cg-iters", type=int, default=None,
                    help="PCG iteration budget override")
    ap.add_argument("--precond-inv", default=None,
                    choices=["unrolled", "lapack"],
                    help="preconditioner small-inverse override "
                         "(PGOConfig.precond_inv)")
    ap.add_argument("--ab", action="store_true",
                    help="paired A/B: alternate the configured solver (arm "
                         "B) with the PGOConfig defaults (arm A) in ONE "
                         "process, so relay drift hits both arms equally "
                         "(see CLAUDE.md measurement gotchas)")
    ap.add_argument("--ab-reps", type=int, default=3,
                    help="paired repetitions per arm in --ab mode")
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace of ONE steady-state "
                         "solve (configured arms only, no --ab) and print "
                         "the op-level attribution (same tooling as "
                         "profile_encoder.py)")
    args = ap.parse_args()
    cfg_kw = {}
    if args.factor_precision is not None:
        cfg_kw["factor_precision"] = args.factor_precision
    if args.factor_refine is not None:
        cfg_kw["factor_refine"] = args.factor_refine
    if args.chol_panel is not None:
        cfg_kw["chol_panel"] = args.chol_panel
    if args.solver is not None:
        cfg_kw["solver"] = args.solver
    if args.pcg_precond is not None:
        cfg_kw["pcg_precond"] = args.pcg_precond
    if args.cg_iters is not None:
        cfg_kw["cg_iters"] = args.cg_iters
    if args.precond_inv is not None:
        cfg_kw["precond_inv"] = args.precond_inv

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    n, e, real = args.nodes, args.edges, min(args.real, args.nodes)

    # noisy chain with some loop edges (built entirely on host with numpy
    # Sim(3) math — per-element device ops would pay one dispatch each)
    def np_exp_small(t, phi_z, sigma=0.0):
        q = hm.matrix_to_quat(np.asarray(
            [[np.cos(phi_z), -np.sin(phi_z), 0],
             [np.sin(phi_z), np.cos(phi_z), 0], [0, 0, 1]], np.float64))
        return np.concatenate([t, q, [np.exp(sigma)]]).astype(np.float32)

    step = np_exp_small(np.asarray([0.3, 0.0, 0.0]), 0.05)
    gt = [hm.identity()]
    for k in range(1, real):
        gt.append(hm.mul(gt[-1], step))
    gt = np.stack(gt)

    edges = []
    meas = []
    for k in range(1, real):
        z = hm.mul(hm.inv(gt[k - 1]), gt[k])
        z[:3] += 0.05 * rng.standard_normal(3).astype(np.float32)
        meas.append(z)
        edges.append((k, k - 1))
    for k in range(50, real, 97):  # sparse loop edges
        meas.append(hm.mul(hm.inv(gt[k - 50]), gt[k]))
        edges.append((k, k - 50))

    nodes = np.tile(hm.identity(), (n, 1))
    cur = hm.identity()
    nodes[0] = cur
    for k in range(1, real):
        cur = hm.mul(cur, meas[k - 1])
        nodes[k] = cur

    E = len(edges)
    edges_buf = np.zeros((e, 2), np.int32)
    edges_buf[:E] = edges
    meas_buf = np.tile(hm.identity(), (e, 1))
    meas_buf[:E] = np.stack(meas)
    confs = np.ones((e, 7), np.float32)
    valid = np.zeros(e, bool)
    valid[:E] = True
    opt = np.zeros(n, bool)
    opt[1:real] = True

    buffers = (jnp.asarray(nodes), jnp.asarray(edges_buf),
               jnp.asarray(meas_buf), jnp.asarray(confs), jnp.asarray(valid),
               jnp.asarray(opt))

    # Physical lower bound per LM step for the dense solver: the Cholesky
    # factorization alone is (7*k_pad)^3/3 FLOPs, and nothing on a v5e runs
    # fp32 factorizations above the chip's bf16 matmul peak. Through the
    # axon relay `block_until_ready` can return before the work finishes
    # (BASELINE.md caveat; bench.py carries the same guard) — a timed solve
    # below this bound is an async illusion, not a fast solve.
    V5E_PEAK_FLOPS = 197e12
    n_opt = int(opt.sum())
    k_pad = min(max(32, 1 << max(n_opt - 1, 0).bit_length()), n)
    # the bound only holds for the dense solver (auto resolves to pcg past
    # dense_max, where the cost is matvec- not factorization-shaped)
    chol_flops = ((7 * k_pad) ** 3 / 3.0
                  if n_opt <= PGOConfig().dense_max else 0.0)

    def peak_hbm_gb():
        try:
            stats = jax.local_devices()[0].memory_stats()
            return stats.get("peak_bytes_in_use", 0) / 2**30
        except Exception:
            return float("nan")

    def solve(cfg):
        resolved = cfg.solver
        if resolved == "auto":
            resolved = "dense" if n_opt <= cfg.dense_max else "pcg"
        if resolved == "pcg":
            # no factorization-shaped lower bound exists for the matvec
            # solver, so the async-illusion guard cannot discriminate —
            # always time through a forced host fetch instead (adds one
            # device->host RTT, conservative for the sub-second solves)
            t0 = time.time()
            out, info = optimize_pose_graph(*buffers, cfg)
            np.asarray(out)
            return time.time() - t0, info
        t0 = time.time()
        out, info = optimize_pose_graph(*buffers, cfg)
        jax.block_until_ready(out)
        dt = time.time() - t0
        min_dt = int(info["steps"]) * chol_flops / V5E_PEAK_FLOPS
        if dt < min_dt:
            print(f"WARNING: blocked timing {dt * 1e3:.0f} ms is below the "
                  f"physical bound {min_dt * 1e3:.0f} ms for "
                  f"{int(info['steps'])} LM steps (relay async illusion) — "
                  f"re-timing with a forced host fetch", flush=True)
            t0 = time.time()
            out, info = optimize_pose_graph(*buffers, cfg)
            np.asarray(out)  # conservative: includes one device->host RTT
            dt = time.time() - t0
        return dt, info

    if args.ab:
        if not cfg_kw:
            ap.error("--ab needs at least one override flag (--solver/"
                     "--pcg-precond/--cg-iters/--precond-inv/"
                     "--factor-precision/--factor-refine/--chol-panel); "
                     "with none, arm B is "
                     "identical to arm A and the paired delta is pure noise")
        # paired A/B: compile both arms first, then alternate measured
        # solves in an ABBA schedule (arm order reversed on alternate reps)
        # so LINEAR relay drift cancels exactly within each ABBA quad —
        # a fixed A,B order would measure B systematically half a
        # pair-period later than A.
        arm_a, arm_b = PGOConfig(), PGOConfig(**cfg_kw)
        for name, cfg in (("A (defaults)", arm_a),
                          (f"B ({cfg_kw})", arm_b)):
            dt, info = solve(cfg)
            print(f"arm {name}: compile+first solve {dt:.1f}s  "
                  f"steps={int(info['steps'])} "
                  f"loss {float(info['loss0']):.4g} -> "
                  f"{float(info['loss']):.4g}  "
                  f"peak HBM {peak_hbm_gb():.2f} GB", flush=True)
        times = {"A": [], "B": []}
        for rep in range(args.ab_reps):
            order = (("A", arm_a), ("B", arm_b))
            if rep % 2:
                order = order[::-1]
            for name, cfg in order:
                dt, _ = solve(cfg)
                times[name].append(dt)
        ms = {k: np.asarray(v) * 1e3 for k, v in times.items()}
        for k in ("A", "B"):
            print(f"arm {k}: {ms[k].mean():.0f} ms mean "
                  f"(min {ms[k].min():.0f}, reps {args.ab_reps})")
        print(f"paired delta B-A: {(ms['B'] - ms['A']).mean():+.0f} ms "
              f"({(ms['B'].mean() / ms['A'].mean() - 1) * 100:+.1f}%)  "
              f"({n} nodes / {e} edges padded, {real} real)")
        return

    dt, info = solve(PGOConfig(**cfg_kw))
    print(f"compile+first solve: {dt:.1f}s  "
          f"steps={int(info['steps'])} loss {float(info['loss0']):.4g} -> "
          f"{float(info['loss']):.4g}")

    if args.trace_dir:
        from profile_encoder import attribute_trace
        with jax.profiler.trace(args.trace_dir):
            _, info = solve(PGOConfig(**cfg_kw))
        print(f"traced solve: steps={int(info['steps'])}")
        attribute_trace(args.trace_dir)
        return

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        dt, info = solve(PGOConfig(**cfg_kw))
    print(f"steady-state solve: {(time.time() - t0) / reps * 1e3:.0f} ms "
          f"({n} nodes / {e} edges padded, {real} real)")


if __name__ == "__main__":
    main()
