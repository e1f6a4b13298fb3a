"""Two-epoch trainer smoke on a synthetic scene (tiny model, 8-dev CPU mesh),
including checkpoint save/resume."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_train_data import scannet_root  # noqa: F401  (fixture reuse)


def make_trainer(scannet_root, tmp_path, epochs=2):
    from vista_slam_tpu.parallel.mesh import make_mesh
    from vista_slam_tpu.train.trainer import TrainConfig, Trainer

    data_root, vg_root = scannet_root
    spec = (f"4 @ ScanNet(sensor_data_root='{data_root}', "
            f"view_graph_root='{vg_root}', resolution=(32, 32), "
            f"neighbor_range=4, neighbor_num=1, loop_num=1, "
            f"num_sample_per_scene=2)")
    cfg = TrainConfig(
        train_dataset=spec, test_dataset=spec,
        output_dir=str(tmp_path / "train_out"), batch_size=2, epochs=epochs,
        neighbor_num=1, loop_num=1, warmup_epochs=1,
        model=dict(img_size=(32, 32), patch_size=16, enc_dim=32, enc_depth=1,
                   enc_heads=2, dec_dim=32, dec_depth=4, dec_heads=2,
                   mlp_ratio=2))
    return Trainer(cfg, mesh=make_mesh(8))


def test_trainer_fit_and_resume(scannet_root, tmp_path):  # noqa: F811
    trainer = make_trainer(scannet_root, tmp_path, epochs=2)
    trainer.init_state(resume=False)
    state = trainer.fit()
    assert int(state.step) > 0
    import os

    assert os.path.exists(os.path.join(trainer.cfg.output_dir, "log.txt"))

    # resume: a fresh trainer picks up from the saved checkpoint
    trainer2 = make_trainer(scannet_root, tmp_path, epochs=2)
    trainer2.init_state(resume=True)
    assert trainer2.start_epoch >= 1
    np.testing.assert_allclose(
        np.asarray(trainer2.state.step), np.asarray(state.step))
