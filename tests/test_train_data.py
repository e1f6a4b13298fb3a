"""Training data pipeline on a synthetic on-disk ScanNet-format scene."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vista_slam_tpu.datasets.combinators import BatchedRandomSampler
from vista_slam_tpu.train.data import TrainLoader, build_dataset, collate_graphs


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    """Two tiny scenes in ScanNet sensor-dump layout + view-graph files."""
    root = tmp_path_factory.mktemp("scannet")
    data_root = root / "data"
    vg_root = root / "viewgraphs"
    os.makedirs(vg_root)
    rng = np.random.default_rng(0)
    n_frames = 12
    for scene in ["scene0000_00", "scene0001_00"]:
        sensor = data_root / scene / "sensor_data"
        intr = data_root / scene / "intrinsic"
        os.makedirs(sensor)
        os.makedirs(intr)
        K = np.array([[80.0, 0, 64], [0, 80.0, 48], [0, 0, 1]])
        np.savetxt(intr / "intrinsic_depth.txt",
                   np.block([[K, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]]))
        names = []
        for i in range(n_frames):
            name = f"frame-{i:06d}"
            img = rng.integers(0, 255, (96, 128, 3), np.uint8)
            cv2.imwrite(str(sensor / f"{name}.color.jpg"), img)
            depth_mm = rng.integers(500, 3000, (96, 128)).astype(np.uint16)
            cv2.imwrite(str(sensor / f"{name}.depth.png"), depth_mm)
            T = np.eye(4)
            T[:3, 3] = [0.1 * i, 0, 0]
            np.savetxt(sensor / f"{name}.pose.txt", T)
            names.append(f"{name}.color.jpg")
        with open(vg_root / f"{scene}_imglist.txt", "w") as f:
            f.write("\n".join(names) + "\n")
        with open(vg_root / f"{scene}_viewgraph.txt", "w") as f:
            for i in range(n_frames):
                j = (i + n_frames // 2) % n_frames
                f.write(f"{i}:({j},0.5);\n")
    return str(data_root), str(vg_root)


def test_scannet_view_graph_sampling(scannet_root):
    data_root, vg_root = scannet_root
    spec = (f"4 @ ScanNet(sensor_data_root='{data_root}', "
            f"view_graph_root='{vg_root}', resolution=(64, 64), "
            f"neighbor_range=4, neighbor_num=1, loop_num=1, "
            f"num_sample_per_scene=2)")
    ds = build_dataset(spec)
    assert len(ds) == 4
    g = ds[0]
    assert set(g) == {"main_view", "neighbor_views", "loop_views"}
    assert len(g["neighbor_views"]) == 2 and len(g["loop_views"]) == 1
    v = g["main_view"]
    assert v["img"].shape == (64, 64, 3)
    assert v["pts3d_cam"].shape == (64, 64, 3)
    assert v["valid_mask"].any()
    assert np.isfinite(v["pts3d_cam"]).all()


def test_combinators(scannet_root):
    data_root, vg_root = scannet_root
    base = (f"ScanNet(sensor_data_root='{data_root}', view_graph_root='{vg_root}', "
            f"resolution=(64, 64), neighbor_range=4, num_sample_per_scene=2)")
    ds = build_dataset(f"6 @ {base} + 2 * {base}")
    assert len(ds) == 6 + 2 * 4


def test_sampler_sharding():
    class Dummy:
        def __len__(self):
            return 64

    idxs0 = list(BatchedRandomSampler(Dummy(), 4, 2, world_size=2, rank=0))
    idxs1 = list(BatchedRandomSampler(Dummy(), 4, 2, world_size=2, rank=1))
    assert len(idxs0) == len(idxs1) == 32
    # no overlap between shards, batches have constant resolution index
    assert not (set(i for i, _ in idxs0) & set(i for i, _ in idxs1))
    for shard in (idxs0, idxs1):
        for b in range(0, len(shard), 4):
            assert len({ar for _, ar in shard[b:b + 4]}) == 1


def test_loader_collation(scannet_root):
    data_root, vg_root = scannet_root
    ds = build_dataset(
        f"4 @ ScanNet(sensor_data_root='{data_root}', view_graph_root='{vg_root}', "
        f"resolution=(64, 64), neighbor_range=4, neighbor_num=1, loop_num=1, "
        f"num_sample_per_scene=2)")
    loader = TrainLoader(ds, batch_size=2, n_support=3)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["main"]["img"].shape == (2, 64, 64, 3)
    assert b["support_imgs"].shape == (3, 2, 64, 64, 3)
    assert b["supports"]["pts3d_cam"].shape == (3, 2, 64, 64, 3)


def test_spec_parser_rejects_code():
    with pytest.raises(Exception):
        build_dataset("ScanNet(sensor_data_root=__import__('os').getcwd())")


def test_sampler_survives_unreadable_frames(scannet_root, tmp_path):
    """Corrupt frames are skipped with bounded retries (reference:
    scannet.py:153-155,174-175); a fully corrupt scene raises instead of
    looping forever."""
    import shutil

    from vista_slam_tpu.datasets.view_graph import ScanNet

    data_root, vg_root = scannet_root
    my_data = str(tmp_path / "data")
    shutil.copytree(data_root, my_data)

    def corrupt(scene, indices):
        sensor = os.path.join(my_data, scene, "sensor_data")
        for i in indices:
            with open(os.path.join(sensor, f"frame-{i:06d}.color.jpg"), "wb") as f:
                f.write(b"not an image")

    kw = dict(sensor_data_root=my_data, view_graph_root=vg_root,
              resolution=(32, 32), neighbor_range=4, neighbor_num=1,
              loop_num=1, num_sample_per_scene=2, seed=0)

    corrupt("scene0000_00", [2, 7])  # a few bad frames: sampling still works
    ds = ScanNet(**kw)
    for idx in range(len(ds)):
        g = ds[idx]
        assert g["main_view"]["img"].shape == (32, 32, 3)

    corrupt("scene0000_00", range(12))  # whole scene unreadable -> bounded
    ds = ScanNet(**kw)
    with pytest.raises(RuntimeError, match="failed to sample"):
        for idx in range(len(ds)):
            ds[idx]


def test_threaded_loader_matches_synchronous(scannet_root):
    """num_workers must not change the data stream: per-(epoch, index)
    seeded sampling makes the threaded prefetching loader emit exactly the
    synchronous loader's batches, in order."""
    from vista_slam_tpu.train.data import TrainLoader

    data_root, vg_root = scannet_root
    spec = (f"8 @ ScanNet(sensor_data_root='{data_root}', "
            f"view_graph_root='{vg_root}', resolution=(32, 32), "
            f"neighbor_range=4, neighbor_num=1, loop_num=1, "
            f"num_sample_per_scene=4)")

    def batches(num_workers):
        loader = TrainLoader(build_dataset(spec), batch_size=2, n_support=3,
                             num_workers=num_workers)
        loader.set_epoch(1)
        return list(loader)

    sync = batches(0)
    threaded = batches(3)
    assert len(sync) == len(threaded) == 4
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(b["main"]["img"], a["main"]["img"])
        np.testing.assert_array_equal(b["support_imgs"], a["support_imgs"])
        np.testing.assert_array_equal(b["supports"]["pts3d_cam"],
                                      a["supports"]["pts3d_cam"])

    # a second epoch draws different samples (epoch is in the seed)
    loader = TrainLoader(build_dataset(spec), batch_size=2, n_support=3)
    loader.set_epoch(2)
    other = list(loader)
    assert not all(
        np.array_equal(a["main"]["img"], b["main"]["img"])
        for a, b in zip(sync, other))
