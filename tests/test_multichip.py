"""Multi-chip dryrun on the virtual 8-device CPU mesh: the full training step
(dp data parallel + tp tensor parallel) must compile and execute."""

import sys


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_make_mesh_raises_on_too_few_devices():
    import pytest

    from vista_slam_tpu.parallel.mesh import make_mesh

    with pytest.raises(RuntimeError, match="only 8 device"):
        make_mesh(16)


def test_param_sharding_rules():
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import STA, STAConfig
    from vista_slam_tpu.parallel.mesh import make_mesh, param_shardings

    cfg = STAConfig(img_size=(32, 32), patch_size=16, enc_dim=64, enc_depth=1,
                    enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                    mlp_ratio=4, compute_dtype=jnp.float32)
    model = STA(cfg)
    import jax

    img = jnp.zeros((1, 32, 32, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), img, img))
    mesh = make_mesh(8)
    sh = param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {"/".join(getattr(p, "key", str(p)) for p in path): s.spec
             for path, s in flat}
    # qkv is column-parallel, its consumer proj row-parallel
    qkv = [v for k, v in specs.items() if k.endswith("attn/qkv/kernel")]
    proj = [v for k, v in specs.items() if k.endswith("attn/proj/kernel")]
    assert all(tuple(s) == (None, "tp") for s in qkv), qkv
    assert all(tuple(s) == ("tp", None) for s in proj), proj
