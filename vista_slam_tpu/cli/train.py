"""Training entry point.

Usage:
  python -m vista_slam_tpu.cli.train --config configs/train_default.yaml \
      [--resume] [--output DIR]

The config is YAML with TrainConfig fields; dataset specs use the composable
registry syntax, e.g.:
  train_dataset: >
    10000 @ ScanNet(sensor_data_root='/data/scannet', view_graph_root='/data/vg',
                    split='train', resolution=(224, 224), neighbor_num=1, loop_num=1)
(reference CLI: train.py + sta_model/train.py:68-175, with eval()-based specs
replaced by a safe parser.)

Optimizer-state compression: `opt_state_dtype: fp32|bf16|int8|bf16_fused|
int8_fused` selects the Adam moment storage (train/quantized_opt.py). The
*_fused modes run the single-pass Pallas kernel and require a dp-only mesh;
they reject gradient accumulation and parameter freezing at construction
time with a ValueError naming the fallback (use bf16/int8 there).
"""

from __future__ import annotations

import argparse
import dataclasses

import yaml

from ..train.trainer import TrainConfig, Trainer
from ..utils.logging import log


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        raw = yaml.safe_load(f) or {}
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    unknown = set(raw) - fields
    if unknown:
        raise SystemExit(f"unknown config keys: {sorted(unknown)}")
    if args.output:
        raw["output_dir"] = args.output
    cfg = TrainConfig(**raw)

    trainer = Trainer(cfg)
    trainer.init_state(resume=args.resume)
    log(f"training on mesh {dict(trainer.mesh.shape)} — "
        f"{len(trainer.loader)} steps/epoch, {cfg.epochs} epochs")
    trainer.fit()


if __name__ == "__main__":
    main()
