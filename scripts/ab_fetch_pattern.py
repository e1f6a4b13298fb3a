#!/usr/bin/env python
"""Isolated A/B of the per-keyframe host-fetch pattern (VERDICT r5 #5).

The online loop's per-keyframe synchronization used to device_get a dict of
~9 small arrays (poses, confs, K, scale rows); slam/frontend.py now packs
them into ONE flat fp32 vector on device (_pack_host). End-to-end stress
wall-times through the dev relay swing >10x with relay load (BASELINE.md
"Measurement gotchas" — observed 25 MB device_get: 0.15 s..511 s in one
session), so this script measures the MECHANISM in isolation, immune to
that weather: the two fetch patterns interleaved call-by-call in one
process, medians over N reps. Per-leaf round trips are the hypothesis;
identical total bytes either way (~2 KB).

Usage: python scripts/ab_fetch_pattern.py [--reps 50] [--batch 4]
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

    from vista_slam_tpu.slam.frontend import _HOST_SHAPES, _HOST_SPEC, _PAIR_FLOATS

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4, help="pair bucket size")
    ap.add_argument("--j-max", type=int, default=8, help="scale-job rows")
    args = ap.parse_args()
    b, j_max = args.batch, args.j_max

    print(f"devices: {jax.devices()}")

    # the OLD transfer pattern: the fused step's host dict, one device array
    # per output family (9 leaves at the shapes frontend.py used to fetch)
    rng = np.random.default_rng(0)
    dict_dev = {}
    for k, w in _HOST_SPEC:
        shape = (b,) + _HOST_SHAPES.get(k, (w,) if w > 1 else ())
        dict_dev[k] = jax.device_put(
            rng.standard_normal(shape).astype(np.float32))
    dict_dev["scale"] = jax.device_put(
        rng.standard_normal(j_max).astype(np.float32))
    dict_dev["scale_conf"] = jax.device_put(
        rng.standard_normal(j_max).astype(np.float32))

    # the NEW pattern: ONE packed vector of the same payload
    packed_dev = jax.device_put(rng.standard_normal(
        b * _PAIR_FLOATS + 2 * j_max).astype(np.float32))

    # a fresh device array per rep: device_get caches the host value on the
    # jax.Array, so re-fetching the same object is free after the first rep
    # — bump every leaf on device each iteration so each timed fetch is a
    # real transfer.
    bump_tree = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 1.0, t))

    t_dict, t_packed = [], []
    for _ in range(args.reps):  # interleaved, same relay weather per pair
        dict_dev = bump_tree(dict_dev)
        packed_dev = bump_tree(packed_dev)
        jax.block_until_ready((dict_dev, packed_dev))  # time transfer only
        t0 = time.perf_counter()
        jax.device_get(dict_dev)
        t_dict.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(packed_dev)
        t_packed.append(time.perf_counter() - t0)

    def stats(ts):
        ts = np.asarray(ts) * 1000
        return (f"median {np.median(ts):7.1f} ms   p10 {np.percentile(ts, 10):7.1f}"
                f"   p90 {np.percentile(ts, 90):7.1f}")

    n_leaves = len(dict_dev)
    print(f"payload: {b} pairs + {j_max} job rows "
          f"({b * _PAIR_FLOATS + 2 * j_max} floats total)")
    print(f"old (dict of {n_leaves} arrays): {stats(t_dict)}")
    print(f"new (1 packed vector):     {stats(t_packed)}")
    print(f"speedup (median): {np.median(t_dict) / np.median(t_packed):.2f}x")


if __name__ == "__main__":
    main()
