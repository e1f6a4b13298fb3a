#!/usr/bin/env python
"""Training-step throughput of the full-size STA model on the current
accelerator: steady-state step time, two-view pairs/s, and MFU from XLA
cost analysis of the step program (forward + backward + AdamW).

K optimizer steps run inside ONE compiled lax.scan program so params and
optimizer state never leave the device — a bare jitted-step loop through
the dev relay round-trips the multi-GB train state per dispatch and
measures the tunnel, not the chip (same technique as bench.py's
device-resident decode loop).

The reference trains with DDP/AMP on CUDA (reference:
vista_slam/sta_model/train.py:233-328) and publishes no throughput numbers;
this records the v5e counterpart for BASELINE.md.

Usage: python scripts/profile_train.py [--batch 4] [--support 1] [--steps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.train.step import make_loss_fn, make_optimizer

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--support", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing (cfg.remat)")
    ap.add_argument("--img-size", type=int, nargs=2, default=(224, 224),
                    metavar=("H", "W"),
                    help="input resolution; 384 512 = the highres fine-tune "
                         "regime (configs/highres.yaml, 769 tokens -> flash)")
    ap.add_argument("--attn-bf16-grad", action="store_true",
                    help="store attention probabilities in bf16 for the "
                         "backward pass (cfg.attn_bf16_grad)")
    ap.add_argument("--attn-fused-train", action="store_true",
                    help="fused short-sequence Pallas attention, fwd + "
                         "one-kernel bwd (cfg.attn_fused_train)")
    ap.add_argument("--gelu-approx", action="store_true",
                    help="tanh-approximate GELU in the MLPs instead of the "
                         "reference's exact erf (cfg.gelu_approx)")
    ap.add_argument("--head-bf16", action="store_true",
                    help="bf16 compute in the DPT head's conv pyramid "
                         "(cfg.head_bf16; fp32 params and fp32 output)")
    ap.add_argument("--opt-state", default="fp32",
                    choices=("fp32", "bf16", "int8", "bf16_fused",
                             "int8_fused"),
                    help="Adam moment storage (train/quantized_opt.py): "
                         "fp32 = reference AdamW; bf16/int8 = compressed "
                         "XLA carriers; *_fused = single-pass Pallas "
                         "kernel (ops/pallas/adam8.py); same update math")
    ap.add_argument("--reproj-grad", default="bf16_scatter",
                    choices=("f32", "bf16_scatter", "sorted"),
                    help="reprojection sampler VJP (losses.py): bf16_scatter"
                         " = row-serial TPU scatter with bf16 payload; "
                         "sorted = scatter-free argsort+cumsum VJP in fp32")
    ap.add_argument("--save-losses", default=None,
                    help="save the timed scan's per-step loss sequence to "
                         "this .npy (trajectory-identity evidence across "
                         "--opt-state arms: same data + seed -> comparable "
                         "loss curves)")
    ap.add_argument("--trace-dir", default=None,
                    help="also capture a jax.profiler trace of one timed "
                         "scan program here (op-level attribution of the "
                         "step time)")
    ap.add_argument("--compile-only", action="store_true",
                    help="stop after compile + compiler memory analysis "
                         "(for peak-memory A/Bs of config knobs, e.g. "
                         "attn_bf16_grad at batch >=16 without remat, "
                         "without paying a timed run per arm)")
    args = ap.parse_args()
    B, S, K = args.batch, args.support, args.steps

    print(f"devices: {jax.devices()}", flush=True)
    cfg = STAConfig(compute_dtype=jnp.bfloat16, remat=args.remat,
                    img_size=tuple(args.img_size),
                    attn_bf16_grad=args.attn_bf16_grad,
                    attn_fused_train=args.attn_fused_train,
                    gelu_approx=args.gelu_approx,
                    head_bf16=args.head_bf16)
    t0 = time.time()
    model, params = init_params_host(cfg, seed=0)
    params = jax.device_put(params)
    print(f"params ready in {time.time() - t0:.1f}s", flush=True)

    H, W = cfg.img_size
    rng = np.random.default_rng(0)

    def views(shape_prefix):
        return {
            "pts3d_cam": jnp.asarray(
                rng.uniform(0.5, 2.0, shape_prefix + (H, W, 3)).astype(np.float32)),
            "valid_mask": jnp.ones(shape_prefix + (H, W), bool),
            "camera_pose": jnp.broadcast_to(jnp.eye(4), shape_prefix + (4, 4)),
            "camera_intrinsics": jnp.broadcast_to(
                jnp.asarray([[140.0, 0, W / 2], [0, 140.0, H / 2], [0, 0, 1]]),
                shape_prefix + (3, 3)),
        }

    batch = {
        "main": dict(views((B,)), img=jnp.asarray(
            rng.standard_normal((B, H, W, 3)).astype(np.float32))),
        "supports": views((S, B)),
        "support_imgs": jnp.asarray(
            rng.standard_normal((S, B, H, W, 3)).astype(np.float32)),
    }

    loss_fn = make_loss_fn(model, S, reproj_grad=args.reproj_grad)
    optimizer = make_optimizer(total_steps=10_000,
                               state_dtype=args.opt_state)
    opt_state = optimizer.init(params)

    fused = hasattr(optimizer, "step")

    def one_step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        if fused:
            params, opt_state = optimizer.step(params, grads, opt_state)
            return params, opt_state, loss
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def multi(params, opt_state, batch):
        def body(carry, _):
            p, o = carry
            p, o, loss = one_step(p, o, batch)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=K)
        return p, o, losses

    jmulti = jax.jit(multi, donate_argnums=(0, 1))
    t0 = time.time()
    compiled = jmulti.lower(params, opt_state, batch).compile()
    print(f"compile ({K}-step scan program): {time.time() - t0:.1f}s",
          flush=True)
    try:
        ma = compiled.memory_analysis()
        peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes)
        print(f"compiler memory analysis: args "
              f"{ma.argument_size_in_bytes / 1e9:.2f} GB (donated), temp "
              f"{ma.temp_size_in_bytes / 1e9:.2f} GB -> "
              f"~{peak / 1e9:.2f} GB static peak", flush=True)
    except Exception as e:
        print(f"memory analysis unavailable: {e}")
    if args.compile_only:
        return
    flops = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # XLA cost analysis counts the scan body ONCE, so the program total
        # IS the per-step cost (verified against a single-step program and
        # the analytic count: ~5.3 TFLOP at batch 4 / 1 support)
        flops = float(cost["flops"])
    except Exception as e:
        print(f"cost analysis unavailable: {e}")

    t0 = time.time()
    params, opt_state, losses = compiled(params, opt_state, batch)
    jax.block_until_ready(losses)
    print(f"first run: {time.time() - t0:.1f}s, "
          f"losses {np.asarray(losses)[:3].round(3)}...", flush=True)

    if args.save_losses:
        np.save(args.save_losses, np.asarray(losses))
        print(f"saved {K}-step loss trajectory (steps 1-{K} from init) "
              f"to {args.save_losses}", flush=True)

    t0 = time.time()
    params, opt_state, losses = compiled(params, opt_state, batch)
    jax.block_until_ready(losses)
    dt = (time.time() - t0) / K

    pairs = S * B  # two-view pairs per step (both directions included)
    print(f"train step (device-resident): {dt * 1e3:.0f} ms "
          f"(batch {B}, {S} support views) -> {pairs / dt:.1f} pairs/s, "
          f"{B / dt:.1f} graphs/s")
    if flops:
        mfu = flops / dt / V5E_BF16_PEAK_FLOPS
        print(f"{flops / 1e12:.2f} TFLOP/step (XLA cost analysis) -> "
              f"{flops / dt / 1e12:.1f} TFLOP/s = {mfu * 100:.1f}% MFU "
              f"of v5e bf16 peak")
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            print(f"device peak_bytes_in_use: "
                  f"{stats['peak_bytes_in_use'] / 1e9:.2f} GB "
                  f"(live measured, whole process)", flush=True)
    except Exception:
        pass

    if args.trace_dir:
        print(f"capturing jax.profiler trace to {args.trace_dir} ...",
              flush=True)
        with jax.profiler.trace(args.trace_dir):
            params, opt_state, losses = compiled(params, opt_state, batch)
            jax.block_until_ready(losses)


if __name__ == "__main__":
    main()
