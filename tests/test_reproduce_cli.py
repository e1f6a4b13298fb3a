"""End-to-end reference-asset reproduction driver (cli.reproduce) with
synthetic stand-ins for all three assets the environment does not ship:
a .pth checkpoint in the reference state-dict layout, an ORBvoc-style text
vocabulary, and a TUM-RGBD-format dataset root. The real-asset flow is the
same command with the released files (docs/MIGRATING.md "Reproducing the
reference evaluation")."""

import json
import os

import numpy as np
import pytest
import torch

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("repro")

    # 1. stand-in checkpoint: tiny torch model in the reference layout
    from torch_ref import TorchSTA

    torch.manual_seed(0)
    tm = TorchSTA(img=64, patch=16, ed=64, edep=2, eh=4, dd=48, ddep=4, dh=4)
    pth = str(root / "frontend_sta_weights.pth")
    torch.save({"model": tm.state_dict()}, pth)

    # 2. stand-in ORBvoc.txt: trained tiny vocab, DBoW text format
    from vista_slam_tpu.native.bow import train_vocabulary

    rng = np.random.default_rng(0)
    descs = rng.integers(0, 256, (400, 32), np.uint8)
    voc = train_vocabulary(descs, k=4, levels=3,
                           image_ids=np.repeat(np.arange(10), 40))
    vocab_path = str(root / "ORBvoc.txt")
    voc.save_dbow_text(vocab_path)

    # 3. stand-in dataset: TUM-RGBD layout (same fixture shape as
    # test_evaluate_cli.py)
    scene = root / "data" / "rgbd_dataset_freiburg1_synth"
    os.makedirs(scene / "rgb")
    os.makedirs(scene / "depth")
    base = cv2.resize(rng.integers(0, 255, (60, 80, 3), np.uint8), (640, 480),
                      interpolation=cv2.INTER_CUBIC)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(8):
        ts = 1000.0 + i * 0.1
        m = np.float32([[1, 0, 3 * i], [0, 1, 0]])
        cv2.imwrite(str(scene / "rgb" / f"{ts:.6f}.png"),
                    cv2.warpAffine(base, m, (640, 480)))
        cv2.imwrite(str(scene / "depth" / f"{ts:.6f}.png"),
                    np.full((480, 640), 10000 + 100 * i, np.uint16))
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.1 * i:.4f} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(scene / name, "w") as f:
            f.write("# header\n" + "\n".join(lines) + "\n")

    # base config matching the tiny checkpoint's architecture
    cfg_path = str(root / "base.yaml")
    with open(cfg_path, "w") as f:
        f.write("""
compute_dtype: float32
stride: 1
max_view_num: 10
neighbor_edge_num: 2
loop_edge_num: 1
loop_dist_min: 2
loop_nms: 1
pgo_every: 500
rel_pose_thres: -1.0
model:
  img_size: [64, 64]
  enc_dim: 64
  enc_depth: 2
  enc_heads: 4
  dec_dim: 48
  dec_depth: 4
  dec_heads: 4
  mlp_ratio: 2
""")
    return {"pth": pth, "vocab": vocab_path,
            "data_root": str(root / "data"), "cfg": cfg_path,
            "root": str(root)}


def _run(assets, out, extra):
    from vista_slam_tpu.cli.reproduce import main

    return main(["--weights", assets["pth"], "--vocab", assets["vocab"],
                 "--dataset", "tumrgbd", "--data-root", assets["data_root"],
                 "--config", assets["cfg"], "--scenes", "synth",
                 "--output", out, *extra])


def test_reproduce_end_to_end_and_tolerance_verdicts(assets, tmp_path):
    # first run: converts the .pth (cached), loads the vocab, runs the
    # evaluate driver, writes the report without a verdict
    report = _run(assets, str(tmp_path / "out1"), [])
    assert os.path.exists(assets["pth"].replace(".pth", ".converted.npz"))
    row = report["scenes"][0]
    assert row["scene"] == "synth" and np.isfinite(row["ate_rmse"])
    assert "ok" not in row and report["failures"] == []
    saved = json.load(open(str(tmp_path / "out1/reproduce_report.json")))
    assert saved["scenes"][0]["ate_rmse"] == row["ate_rmse"]

    # PASS: reference = our own measured ATE -> rel delta 0 <= 5%
    ref_path = str(tmp_path / "ref.json")
    with open(ref_path, "w") as f:
        json.dump({"synth": row["ate_rmse"]}, f)
    report2 = _run(assets, str(tmp_path / "out2"),
                   ["--reference-ate", ref_path])
    assert report2["scenes"][0]["ok"] and report2["failures"] == []

    # FAIL: reference 100x tighter -> tolerance exceeded -> exit code 1
    with open(ref_path, "w") as f:
        json.dump({"synth": row["ate_rmse"] / 100.0}, f)
    with pytest.raises(SystemExit) as exc:
        _run(assets, str(tmp_path / "out3"), ["--reference-ate", ref_path])
    assert exc.value.code == 1
    failed = json.load(open(str(tmp_path / "out3/reproduce_report.json")))
    assert failed["failures"] == ["synth"]


def test_convert_infers_depths_from_checkpoint(assets):
    """convert_checkpoint_file must work on any reference-layout checkpoint
    without being told the depths (the released one is 24/12; the CI
    stand-in is 2/4)."""
    from vista_slam_tpu.models.convert import load_torch_checkpoint, _infer_depth

    sd = load_torch_checkpoint(assets["pth"])
    assert _infer_depth(sd, "enc_blocks") == 2
    assert _infer_depth(sd, "dec_block") == 4
