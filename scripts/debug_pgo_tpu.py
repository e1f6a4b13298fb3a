#!/usr/bin/env python
"""Bisect TPU-vs-CPU numerics of the PGO building blocks.

Computes residuals, Jacobians, gradient, block preconditioner, one CG solve
and the resulting loss change on the CURRENT backend and prints norms, so a
CPU run and a TPU run can be diffed. Usage:
  JAX_PLATFORMS=cpu python scripts/debug_pgo_tpu.py
  python scripts/debug_pgo_tpu.py   # axon/TPU
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.ops import sim3
    from vista_slam_tpu.slam import host_math as hm
    from vista_slam_tpu.slam.pgo import (_loss, _residuals_and_jacobians)

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    real, n, e = 300, 400, 500

    def stepg(phi_z, t):
        q = hm.matrix_to_quat(np.asarray(
            [[np.cos(phi_z), -np.sin(phi_z), 0],
             [np.sin(phi_z), np.cos(phi_z), 0], [0, 0, 1]], np.float64))
        return np.concatenate([t, q, [1.0]]).astype(np.float32)

    s = stepg(0.05, np.asarray([0.3, 0, 0]))
    gt = [hm.identity()]
    for k in range(1, real):
        gt.append(hm.mul(gt[-1], s))
    edges, meas = [], []
    for k in range(1, real):
        z = hm.mul(hm.inv(gt[k - 1]), gt[k])
        z[:3] += 0.05 * rng.standard_normal(3).astype(np.float32)
        meas.append(z)
        edges.append((k, k - 1))
    for k in range(50, real, 37):  # loop edges create residual mismatch
        meas.append(hm.mul(hm.inv(gt[k - 50]), gt[k]))
        edges.append((k, k - 50))
    nodes = np.tile(hm.identity(), (n, 1))
    cur = hm.identity()
    for k in range(1, real):
        cur = hm.mul(cur, meas[k - 1])
        nodes[k] = cur
    E = len(edges)
    eb = np.zeros((e, 2), np.int32)
    eb[:E] = edges
    mb = np.tile(hm.identity(), (e, 1))
    mb[:E] = np.stack(meas)
    valid = np.zeros(e, np.float32)
    valid[:E] = 1
    w = np.ones((e, 7), np.float32) * valid[:, None]
    opt = np.ones(n, np.float32)[:, None]
    opt[0] = 0

    with jax.default_matmul_precision("highest"):
        nodes_j = jnp.asarray(nodes)
        loss0, r0 = _loss(nodes_j, jnp.asarray(eb), jnp.asarray(mb), jnp.asarray(w))
        r, Ji, Jj = _residuals_and_jacobians(nodes_j, jnp.asarray(eb), jnp.asarray(mb))
        print(f"loss0 {float(loss0):.6f}  |r| {float(jnp.linalg.norm(r * valid[:, None])):.6f}")
        print(f"|Ji| {float(jnp.linalg.norm(Ji)):.4f}  |Jj| {float(jnp.linalg.norm(Jj)):.4f}")
        print(f"Ji finite: {bool(jnp.isfinite(Ji).all())}  Jj finite: {bool(jnp.isfinite(Jj).all())}")

        mi = opt[eb[:, 0]]
        mj = opt[eb[:, 1]]
        Jim = Ji * jnp.asarray(mi)[..., None]
        Jjm = Jj * jnp.asarray(mj)[..., None]
        wr = jnp.asarray(w) * r
        g = jnp.zeros((n, 7))
        g = g.at[eb[:, 0]].add(jnp.einsum("erc,er->ec", Jim, wr))
        g = g.at[eb[:, 1]].add(jnp.einsum("erc,er->ec", Jjm, wr))
        print(f"|g| {float(jnp.linalg.norm(g)):.6f}")

        # simple GD sanity: loss along -g must decrease for a small step
        for alpha in (1e-4, 1e-3, 1e-2):
            x_new = sim3.normalize(sim3.retract(nodes_j, -alpha * g * jnp.asarray(opt)))
            l, _ = _loss(x_new, jnp.asarray(eb), jnp.asarray(mb), jnp.asarray(w))
            print(f"  GD alpha={alpha:g}: loss {float(l):.6f}")


if __name__ == "__main__":
    main()
