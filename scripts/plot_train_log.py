#!/usr/bin/env python
"""Plot training curves from the JSONL log written by the trainer
(train/trainer.py -> <output_dir>/log.txt; the reference logs the same
stats to tensorboard + log.txt, train.py:409-431).

Usage: python scripts/plot_train_log.py --log output/train/log.txt
"""

import argparse
import json


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rows = [json.loads(line) for line in open(args.log) if line.strip()]
    epochs = [r["epoch"] for r in rows]
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(epochs, [r.get("loss") for r in rows], label="train")
    if any("test_loss" in r for r in rows):
        axes[0].plot(epochs, [r.get("test_loss") for r in rows], label="test")
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("loss")
    axes[0].legend()
    axes[1].plot(epochs, [r.get("alpha") for r in rows])
    axes[1].set_xlabel("epoch")
    axes[1].set_ylabel("conf alpha (coarse-to-fine)")
    out = args.out or args.log.rsplit("/", 1)[0] + "/train_curves.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
