"""Two-epoch trainer smoke on a synthetic scene (tiny model, 8-dev CPU mesh),
including checkpoint save/resume."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_train_data import scannet_root  # noqa: F401  (fixture reuse)


def make_trainer(scannet_root, tmp_path, epochs=2, tp=None, ds_mult=4,
                 **cfg_overrides):
    from vista_slam_tpu.parallel.mesh import make_mesh
    from vista_slam_tpu.train.trainer import TrainConfig, Trainer

    data_root, vg_root = scannet_root
    spec = (f"{ds_mult} @ ScanNet(sensor_data_root='{data_root}', "
            f"view_graph_root='{vg_root}', resolution=(32, 32), "
            f"neighbor_range=4, neighbor_num=1, loop_num=1, "
            f"num_sample_per_scene=2)")
    kwargs = dict(
        train_dataset=spec, test_dataset=spec,
        output_dir=str(tmp_path / "train_out"), batch_size=2, epochs=epochs,
        neighbor_num=1, loop_num=1, warmup_epochs=1,
        model=dict(img_size=(32, 32), patch_size=16, enc_dim=32, enc_depth=1,
                   enc_heads=2, dec_dim=32, dec_depth=4, dec_heads=2,
                   mlp_ratio=2))
    kwargs.update(cfg_overrides)
    cfg = TrainConfig(**kwargs)
    return Trainer(cfg, mesh=make_mesh(8, tp=tp))


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


def test_trainer_fused_opt_resume(scannet_root, tmp_path):  # noqa: F811
    """orbax round-trip of FusedAdamWState through Trainer.fit + resume:
    the template-based restore (trainer.restore_checkpoint) must reproduce
    the int8/fp32-mixed moment pytree bit-exactly, and the resumed trainer
    must be able to keep stepping through the fused kernel."""
    import jax

    from vista_slam_tpu.train.quantized_opt import FusedInt8Leaf

    # tp=1 (the fused kernel's dp-only requirement) makes dp=8, so the
    # global batch must be divisible by 8
    trainer = make_trainer(scannet_root, tmp_path, epochs=2, tp=1,
                           opt_state_dtype="int8_fused", batch_size=8, ds_mult=16)
    trainer.init_state(resume=False)
    state = trainer.fit()
    assert int(state.step) > 0
    # the checkpointed state must actually contain quantized leaves
    # (otherwise this test exercises only the fp32 fallback path)
    n_quant = sum(isinstance(leaf, FusedInt8Leaf) for leaf in
                  jax.tree_util.tree_leaves(
                      state.opt_state.moments,
                      is_leaf=lambda x: isinstance(x, FusedInt8Leaf)))
    assert n_quant > 0

    trainer2 = make_trainer(scannet_root, tmp_path, epochs=2, tp=1,
                            opt_state_dtype="int8_fused", batch_size=8, ds_mult=16)
    trainer2.init_state(resume=True)
    assert trainer2.start_epoch >= 1
    # bit-exact moment restore, including int8 codes and fp32 scales
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(trainer2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state steps (fused kernel path, interpret on CPU)
    import dataclasses

    trainer2.cfg = dataclasses.replace(trainer2.cfg, epochs=3)
    stats = trainer2.train_one_epoch(2)
    assert np.isfinite(stats["loss"])


def test_smoothed_value_and_metric_logger():
    from vista_slam_tpu.train.metrics import MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in [1.0, 100.0, 2.0, 3.0]:
        sv.update(v)
    # window = [100, 2, 3] -> median 3, global avg over all 4
    assert sv.median == 3.0
    assert abs(sv.global_avg - 26.5) < 1e-9
    assert sv.value == 3.0 and sv.max == 100.0

    ml = MetricLogger(window_size=4)
    ml.update(loss=1.0, lr=0.1)
    ml.update(loss=2.0, lr=0.1)
    assert ml.loss.median in (1.0, 1.5, 2.0)
    assert "loss" in ml.summary()


def test_alpha_actually_reaches_the_loss(scannet_root, tmp_path):  # noqa: F811
    """The coarse-to-fine schedule must change the optimized objective
    (reference: train.py:466-468); a fixed default would make alpha dead."""
    import jax.numpy as jnp

    trainer = make_trainer(scannet_root, tmp_path, epochs=1)
    trainer.init_state(resume=False)
    trainer.loader.set_epoch(0)
    batch = trainer.shard_batch(next(iter(trainer.loader)))
    with trainer.mesh:
        l_a, _ = trainer.eval_loss_fn(trainer.state.params, batch, 0.4)
        l_b, _ = trainer.eval_loss_fn(trainer.state.params, batch, 0.0)
    assert abs(float(l_a) - float(l_b)) > 1e-6


def test_non_finite_loss_aborts(scannet_root, tmp_path):  # noqa: F811
    """NaN batch -> FloatingPointError with diagnostics
    (reference: train.py:287-290)."""
    trainer = make_trainer(scannet_root, tmp_path, epochs=1)
    trainer.init_state(resume=False)

    poisoned = {}

    class PoisonLoader:
        def __init__(self, inner):
            self.inner = inner

        def set_epoch(self, e):
            self.inner.set_epoch(e)

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for b in self.inner:
                b["main"]["img"] = np.full_like(b["main"]["img"], np.nan)
                yield b

    trainer.loader = PoisonLoader(trainer.loader)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.train_one_epoch(0)


def test_best_checkpoint_and_tensorboard(scannet_root, tmp_path):  # noqa: F811
    import os

    trainer = make_trainer(scannet_root, tmp_path, epochs=2)
    trainer.cfg.tensorboard = True
    trainer.writer = __import__(
        "vista_slam_tpu.train.metrics", fromlist=["ScalarWriter"]
    ).ScalarWriter(os.path.join(trainer.cfg.output_dir, "tb"), enabled=True)
    trainer.init_state(resume=False)
    trainer.fit()
    out = trainer.cfg.output_dir
    # best checkpoint exists and tracks a real epoch
    assert os.path.isdir(os.path.join(out, "checkpoints_best"))
    assert trainer.best_epoch >= 0
    assert np.isfinite(trainer.best_so_far)
    # scalar events were written (tensorboard event file or jsonl fallback)
    tb_dir = os.path.join(out, "tb")
    files = os.listdir(tb_dir)
    assert any(f.startswith("events.out") or f == "scalars.jsonl"
               for f in files), files


def test_train_cli_end_to_end(scannet_root, tmp_path):  # noqa: F811
    """The train CLI (YAML config -> TrainConfig -> Trainer.fit) runs one
    epoch end-to-end, and unknown config keys are rejected up front."""
    import yaml

    from vista_slam_tpu.cli.train import main

    data_root, vg_root = scannet_root
    spec = (f"4 @ ScanNet(sensor_data_root='{data_root}', "
            f"view_graph_root='{vg_root}', resolution=(32, 32), "
            f"neighbor_range=4, neighbor_num=1, loop_num=1, "
            f"num_sample_per_scene=2)")
    raw = dict(
        train_dataset=spec, test_dataset=spec,
        output_dir=str(tmp_path / "cli_out"), batch_size=2, epochs=1,
        neighbor_num=1, loop_num=1, warmup_epochs=1,
        model=dict(img_size=[32, 32], patch_size=16, enc_dim=32, enc_depth=1,
                   enc_heads=2, dec_dim=32, dec_depth=4, dec_heads=2,
                   mlp_ratio=2))
    cfg_path = str(tmp_path / "train.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    main(["--config", cfg_path])
    import os

    assert os.path.exists(os.path.join(raw["output_dir"], "log.txt"))

    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(raw, not_a_real_key=1), f)
    with pytest.raises(SystemExit, match="unknown config keys"):
        main(["--config", cfg_path])
