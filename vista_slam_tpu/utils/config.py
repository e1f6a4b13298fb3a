"""YAML config loading with attribute access (replaces the reference's
munch dependency; reference: run.py:105-116)."""

from __future__ import annotations

from typing import Any

import yaml


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k: str) -> Any:
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) else v

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v


DEFAULTS = dict(
    device="tpu",
    verbose=False,
    rerun_vis=False,
    rerun_save=False,
    output_dir="output/test",
    sta_weights=None,          # path to converted .npz / .msgpack weights
    sta_torch_weights=None,    # path to a PyTorch .pth checkpoint (auto-converted)
    vocab_path=None,           # bag-of-words vocabulary (trained or DBoW-text)
    random_seed=43,
    max_view_num=400,
    neighbor_edge_num=3,
    loop_edge_num=3,
    loop_dist_min=40,
    loop_nms=40,
    loop_cand_thresh_neighbor=5,
    point_conf_thres=4.2,
    rel_pose_thres=0.75,
    keyframe_detection="flow_stride",
    stride=25,
    flow_thres=5.0,
    pgo_every=500,
    compute_dtype="bfloat16",
)


def load_config(path: str | None = None, **overrides) -> Config:
    cfg = Config(DEFAULTS)
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg.update(data)
    for k, v in overrides.items():
        if v is not None:
            cfg[k] = v
    return cfg
