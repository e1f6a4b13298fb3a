"""One-command reference-asset reproduction: released weights + vocabulary +
dataset root in, ATE table and a pass/fail tolerance verdict out.

The reference's evaluation flow is load-weights -> load-ORBvoc -> per-scene
SLAM -> evo ATE (reference: evaluation_tumrgbd.py:37,121-143 with
vista_slam/slam.py:95-106 and loop_detector.py:6-7); reproducing it here
previously took three manual steps (convert the .pth, edit a config, run
cli.evaluate). This driver collapses them into one tested command:

  python -m vista_slam_tpu.cli.reproduce \
      --weights pretrains/frontend_sta_weights.pth \
      --vocab pretrains/ORBvoc.txt \
      --dataset tumrgbd --data-root /data/tumrgbd \
      --reference-ate my_gpu_reference_ate.json

Steps:
  1. Convert the PyTorch checkpoint to the flax .npz layout (cached next to
     the source; .npz input is used as-is).
  2. Materialize a config from the dataset's default YAML with the weight /
     vocabulary paths injected.
  3. Run the evaluate driver (all scenes or --scenes).
  4. Compare each scene's ATE RMSE against --reference-ate (a JSON mapping
     scene -> reference ATE in meters, e.g. measured once with the reference
     repo on your GPU) under --tolerance (default 5%, BASELINE.json's
     north-star contract) and exit non-zero if any scene misses it.

Without --reference-ate the table is produced and recorded without a
verdict (the reference repo publishes no ATE numbers in-repo — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os

import yaml

from ..utils.logging import Channel, log

# dataset spec -> default config shipped for it (reference pairs each
# evaluation_*.py with a config the same way: evaluation_tumrgbd.py:31)
_DEFAULT_CONFIGS = {
    "tumrgbd": "configs/tumrgbd.yaml",
    "tumrgbd_f2f3": "configs/tumrgbd.yaml",
    "7scenes": "configs/7scenes.yaml",
    "replica": "configs/default.yaml",
    "scannet": "configs/default.yaml",
}


def _prepare_weights(path: str) -> str:
    """Return a converted-.npz path for `path`, converting (and caching)
    a PyTorch checkpoint if needed."""
    if path.endswith(".npz"):
        return path
    dst = os.path.splitext(path)[0] + ".converted.npz"
    if (os.path.exists(dst)
            and os.path.getmtime(dst) >= os.path.getmtime(path)):
        log(f"using cached conversion {dst}")
        return dst
    from ..models.convert import convert_checkpoint_file

    log(f"converting {path} -> {dst}")
    convert_checkpoint_file(path, dst)
    return dst


def _materialize_config(base_cfg_path: str, weights_npz: str,
                        vocab: str | None, out_dir: str) -> str:
    with open(base_cfg_path) as f:
        data = yaml.safe_load(f) or {}
    data["sta_weights"] = weights_npz
    data["sta_torch_weights"] = None
    data["vocab_path"] = vocab
    data["output_dir"] = out_dir
    os.makedirs(out_dir, exist_ok=True)
    cfg_path = os.path.join(out_dir, "reproduce_config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(data, f)
    return cfg_path


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--weights", required=True,
                    help="released frontend_sta_weights.pth (auto-converted, "
                         "cached) or an already-converted .npz")
    ap.add_argument("--vocab", default=None,
                    help="ORBvoc.txt (DBoW text) or trained .npz vocabulary; "
                         "omitting it disables loop closure (changes ATE!)")
    ap.add_argument("--dataset", default="tumrgbd",
                    choices=sorted(_DEFAULT_CONFIGS))
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--config", default=None,
                    help="base config YAML (default: the dataset's shipped "
                         "config)")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--recon", action="store_true")
    ap.add_argument("--output", default="output/reproduce")
    ap.add_argument("--reference-ate", default=None,
                    help="JSON file mapping scene -> reference ATE RMSE "
                         "(meters) to compare against")
    ap.add_argument("--tolerance", type=float, default=0.05,
                    help="allowed relative ATE regression vs the reference "
                         "(default 0.05 = the BASELINE.json north star)")
    args = ap.parse_args(argv)

    if not os.path.exists(args.weights):
        ap.error(f"weights not found: {args.weights}")
    if args.vocab and not os.path.exists(args.vocab):
        ap.error(f"vocabulary not found: {args.vocab}")
    if args.vocab is None:
        log("no vocabulary given — loop closure DISABLED; trajectories on "
            "loopy sequences will NOT match the reference", Channel.WARNING)

    weights_npz = _prepare_weights(args.weights)
    base_cfg = args.config or _DEFAULT_CONFIGS[args.dataset]
    cfg_path = _materialize_config(base_cfg, weights_npz, args.vocab,
                                   args.output)

    from .evaluate import main as evaluate_main

    eval_args = ["--dataset", args.dataset, "--data-root", args.data_root,
                 "--config", cfg_path]
    if args.scenes:
        eval_args += ["--scenes", *args.scenes]
    if args.recon:
        eval_args += ["--recon"]
    results = evaluate_main(eval_args)

    reference = {}
    if args.reference_ate:
        with open(args.reference_ate) as f:
            reference = json.load(f)

    rows, failures = [], []
    for scene, r in results.items():
        row = {"scene": scene, "ate_rmse": float(r["ate_rmse"]),
               "n_keyframes": int(r["n_keyframes"])}
        if scene in reference:
            ref = float(reference[scene])
            rel = (row["ate_rmse"] - ref) / max(ref, 1e-12)
            row.update(reference_ate=ref, rel_delta=rel,
                       ok=bool(rel <= args.tolerance))
            if not row["ok"]:
                failures.append(scene)
        rows.append(row)

    log("=" * 62, Channel.EVAL)
    log(f"{'scene':<28}{'ATE RMSE':>10}{'reference':>10}{'delta':>8}  verdict",
        Channel.EVAL)
    for row in rows:
        if "reference_ate" in row:
            verdict = "PASS" if row["ok"] else "FAIL"
            log(f"{row['scene']:<28}{row['ate_rmse']:>10.4f}"
                f"{row['reference_ate']:>10.4f}{row['rel_delta']:>+7.1%}  "
                f"{verdict}", Channel.EVAL)
        else:
            log(f"{row['scene']:<28}{row['ate_rmse']:>10.4f}{'—':>10}{'—':>8}  "
                f"(no reference)", Channel.EVAL)

    report = {"dataset": args.dataset, "tolerance": args.tolerance,
              "weights": args.weights, "vocab": args.vocab, "scenes": rows,
              "failures": failures}
    report_path = os.path.join(args.output, "reproduce_report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report written to {report_path}", Channel.EVAL)

    if failures:
        log(f"TOLERANCE FAILURES: {failures}", Channel.EVAL)
        raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()
