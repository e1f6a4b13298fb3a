"""Shared CLI plumbing: build the SLAM system from a config."""

from __future__ import annotations

import os

import numpy as np

from ..utils.config import Config
from ..utils.logging import Channel, log


def enable_compilation_cache(cfg: Config | None = None):
    """Persist XLA compilations across runs — the full-size frontend costs
    minutes to compile per shape bucket, once per machine with this on."""
    default = os.path.expanduser("~/.cache/vista_slam_tpu/xla")
    path = cfg.get("compilation_cache_dir", default) if cfg is not None else default
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compilation cache disabled: {e}", Channel.WARNING)


def build_frontend(cfg: Config):
    import jax.numpy as jnp

    enable_compilation_cache(cfg)

    from ..models.convert import load_params_npz
    from ..models.sta import STAConfig, init_params
    from ..slam.frontend import FrontendEngine

    dtype = jnp.bfloat16 if str(cfg.get("compute_dtype", "bfloat16")) == "bfloat16" else jnp.float32
    overrides = dict(cfg.get("model", {}) or {})
    if "img_size" in overrides:
        overrides["img_size"] = tuple(overrides["img_size"])
    model_cfg = STAConfig(compute_dtype=dtype, **overrides)

    params = None
    if cfg.get("sta_weights") and os.path.exists(cfg.sta_weights):
        log(f"loading converted weights from {cfg.sta_weights}")
        params = load_params_npz(cfg.sta_weights)
    elif cfg.get("sta_torch_weights") and os.path.exists(cfg.sta_torch_weights):
        from ..models.convert import convert_state_dict, load_torch_checkpoint

        log(f"converting torch checkpoint {cfg.sta_torch_weights}")
        params = convert_state_dict(load_torch_checkpoint(cfg.sta_torch_weights))
    if params is None:
        log("no STA weights configured — using RANDOM weights (smoke-test mode)",
            Channel.WARNING)
        _, params = init_params(model_cfg, seed=int(cfg.get("random_seed", 0)))
    return FrontendEngine(model_cfg, params)


def build_loop_detector(cfg: Config):
    from ..native.bow import Vocabulary
    from ..slam.loop_detector import LoopDetector

    path = cfg.get("vocab_path")
    if not path or not os.path.exists(path):
        log("no BoW vocabulary configured — loop closure disabled", Channel.WARNING)
        return None
    vocab = Vocabulary()
    vocab.load(path)
    return LoopDetector(vocab, cfg.loop_dist_min, cfg.loop_nms,
                        cfg.loop_cand_thresh_neighbor)


def build_pgo_config(cfg: Config):
    """Optional `pgo:` mapping in the YAML overrides PGOConfig fields, e.g.
    `pgo: {solver: pcg}` to force the O(E+N)-memory chain-preconditioned
    PCG below the measured dense_max crossover (docs/PERFORMANCE.md), or
    a larger max_steps budget for offline accuracy. Unknown keys fail
    loudly."""
    from ..slam.pgo import PGOConfig

    overrides = cfg.get("pgo") or {}
    bad = set(overrides) - set(PGOConfig._fields)
    if bad:
        raise ValueError(f"unknown pgo config keys: {sorted(bad)} "
                         f"(valid: {list(PGOConfig._fields)})")
    return PGOConfig(**overrides) if overrides else None


def build_slam(cfg: Config, live_mode: bool = False):
    from ..slam.online_slam import OnlineSLAM

    frontend = build_frontend(cfg)
    lc = build_loop_detector(cfg)
    return OnlineSLAM(
        frontend, loop_detector=lc, verbose=bool(cfg.get("verbose", False)),
        max_view_num=cfg.max_view_num, neighbor_edge_num=cfg.neighbor_edge_num,
        loop_edge_num=cfg.loop_edge_num, conf_thres=cfg.point_conf_thres,
        rel_pose_thres=cfg.rel_pose_thres, flow_thres=cfg.flow_thres,
        pgo_every=cfg.pgo_every, live_mode=live_mode,
        combine_loop_batch=bool(cfg.get("combine_loop_batch", False)),
        pgo_config=build_pgo_config(cfg))


def select_stride_indices(n_frames: int, stride: int, max_view_num: int):
    idxs = list(range(1, n_frames, stride))
    if len(idxs) > max_view_num:
        log(f"too many keyframes ({len(idxs)}); sampling {max_view_num} evenly",
            Channel.WARNING)
        idxs = list(np.linspace(0, n_frames - 1, max_view_num).astype(int))
    return set(int(i) for i in idxs)
