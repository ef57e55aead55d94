"""End-to-end: fit a tiny synthetic scene with the full trainer stack."""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.mark.slow
def test_vanilla_overfit_synthetic(tmp_path):
    from synthetic import write_synthetic_colmap_scene
    write_synthetic_colmap_scene(str(tmp_path), n_cams=4, n_pts=64,
                                 width=32, height=32)

    from gssr_tpu.configs.methods import get_method_config
    from gssr_tpu.engine.trainer import Trainer

    config = get_method_config("3dgs")
    config.source_path = str(tmp_path)
    config.output_path = str(tmp_path / "out")
    config.trainer.iterations = 60
    config.trainer.test_iterations = [60]
    config.trainer.save_iterations = [60]
    config.trainer.checkpoint_iterations = [60]
    config.scene.instance_cap = 2048
    config.scene.backend = "reference"
    config.scene.gaussians = config.scene.gaussians.__class__(
        densify_from_iter=10, densification_interval=25,
        opacity_reset_interval=1000, capacity=512)
    config.set_timestamp()
    config.save_config()

    trainer = Trainer(config)
    trainer.setup()
    scene = trainer.scene

    # loss must go down over a few steps (train_step donates its input
    # state, so thread the returned state back)
    cam = scene.dataloader.train_cameras[0]
    scene.state, m0 = scene.train_step(scene.state, cam, 1)
    first_loss = float(m0["loss"])

    state = trainer.train()
    state, m1 = scene.train_step(state, cam, config.trainer.iterations + 1)
    assert float(m1["loss"]) < first_loss

    # artifacts exist
    base = config.get_base_dir()
    assert (base / "point_cloud/iteration_60/point_cloud.ply").exists()
    assert list((base / "chkpnt").glob("ckpt_*.npz"))

    # PLY round-trips through the model loader
    st = scene.gaussians.load_ply(
        str(base / "point_cloud/iteration_60/point_cloud.ply"))
    assert int(st.n_active) > 0

    # config YAML round-trips
    from gssr_tpu.configs.base import load_config_yaml
    cfg2 = load_config_yaml(base / "config.yml")
    assert cfg2.method_name == "3dgs"
    assert cfg2.scene.instance_cap == 2048


@pytest.mark.slow
def test_densify_grows_and_prunes():
    import jax
    import jax.numpy as jnp
    from gssr_tpu.models.vanilla import VanillaGaussianConfig, VanillaGaussians

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (32, 3))
    cols = rng.uniform(0, 1, (32, 3))
    g = VanillaGaussians(VanillaGaussianConfig(capacity=256), 2.0)
    state = g.create_from_points(pts, cols)
    assert int(state.n_active) == 32

    # fake large gradients on the first 8 -> clone or split
    stats = state.stats._replace(
        grad_accum=state.stats.grad_accum.at[:8].set(1.0),
        denom=state.stats.denom.at[:8].set(1.0))
    state = state._replace(stats=stats)
    new_state = jax.jit(g.densify_and_prune)(
        state, jax.random.PRNGKey(0), jnp.asarray(False))
    assert int(new_state.n_active) > 32
    assert bool(jnp.all(new_state.stats.grad_accum == 0))

    # opacity reset clamps activated opacity below 0.011
    reset = jax.jit(g.reset_opacity)(new_state)
    op = jax.nn.sigmoid(reset.params.opacity)
    assert float(op.max()) <= 0.011


def test_scaffold_compact_decode_matches_dense():
    """Compacted (visible-budget) decode must reproduce the dense decode
    exactly on the visible anchors, and mask off everything else."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from gssr_tpu.models.scaffold import (ScaffoldGaussianConfig,
                                          ScaffoldGaussians)

    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (64, 3))
    cfg_dense = ScaffoldGaussianConfig(capacity=256, n_offsets=4,
                                       appearance_dim=0,
                                       visible_budget_factor=0.0)
    cfg_comp = dataclasses.replace(cfg_dense, visible_budget_factor=0.5)
    gd = ScaffoldGaussians(cfg_dense, 2.0, num_cameras=2)
    gc = ScaffoldGaussians(cfg_comp, 2.0, num_cameras=2)
    state = gd.create_from_points(pts)
    CA, K = state.anchors.offset.shape[:2]

    campos = jnp.asarray([0.0, 0.0, -3.0])
    visible = jnp.asarray(rng.random(CA) < 0.6) & state.active
    uid = jnp.asarray(0)

    dense = jax.jit(gd.decode)(state.anchors, state.mlp, campos, uid,
                               visible, state.active)
    comp = jax.jit(gc.decode)(state.anchors, state.mlp, campos, uid,
                              visible, state.active)
    assert comp.anchor_idx is not None and not bool(comp.vb_overflow)
    vb = comp.anchor_idx.shape[0]
    assert vb == 128  # round128(256 * 0.5)

    # expand compacted outputs back to anchor-slot order and compare
    d_op, d_mask, _, _ = gc.expand_stats_inputs(
        comp, jnp.zeros(vb * K), jnp.zeros((vb * K, 2)), CA)
    dm = np.asarray(dense.mask)
    assert (np.asarray(d_mask) == dm).all()
    np.testing.assert_allclose(np.asarray(d_op)[dm],
                               np.asarray(dense.neural_opacity)[dm],
                               rtol=1e-6, atol=1e-6)
    # per-gaussian payloads agree row-for-row through anchor_idx
    idx = np.asarray(comp.anchor_idx)
    valid = np.asarray(comp.valid)
    for f in ("xyz", "color", "opacity", "scaling", "rotation"):
        cv = np.asarray(getattr(comp, f)).reshape(vb, K, -1)[valid]
        dv = np.asarray(getattr(dense, f)).reshape(CA, K, -1)[idx[valid]]
        np.testing.assert_allclose(cv, dv, rtol=1e-5, atol=1e-6)

    # gradients through the compacted decode match the dense decode
    def loss_d(anchors):
        ng = gd.decode(anchors, state.mlp, campos, uid, visible,
                       state.active)
        return jnp.sum(jnp.where(ng.mask, ng.opacity, 0.0) ** 2)

    def loss_c(anchors):
        ng = gc.decode(anchors, state.mlp, campos, uid, visible,
                       state.active)
        return jnp.sum(jnp.where(ng.mask, ng.opacity, 0.0) ** 2)

    g1 = jax.jit(jax.grad(loss_d))(state.anchors)
    g2 = jax.jit(jax.grad(loss_c))(state.anchors)
    for l1, l2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-6)


def test_scaffold_compact_decode_overflow_flag():
    import jax.numpy as jnp
    from gssr_tpu.models.scaffold import (ScaffoldGaussianConfig,
                                          ScaffoldGaussians)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (200, 3))
    cfg = ScaffoldGaussianConfig(capacity=256, n_offsets=2,
                                 appearance_dim=0,
                                 visible_budget_factor=0.3)  # VB=128 < 200
    g = ScaffoldGaussians(cfg, 2.0, num_cameras=1)
    state = g.create_from_points(pts)
    ng = g.decode(state.anchors, state.mlp, jnp.zeros(3), jnp.asarray(0),
                  state.active, state.active)
    assert bool(ng.vb_overflow)


def test_train_split_skips_done_tiles(tmp_path, capsys, monkeypatch):
    """train_split must skip tiles whose latest run has a DONE marker and
    retrain them when --retrain is set."""
    from synthetic import write_synthetic_colmap_scene
    from gssr_tpu.utils.partition import split_scene
    write_synthetic_colmap_scene(str(tmp_path / "scene"), n_cams=8,
                                 n_pts=64, width=32, height=32)
    split_scene(str(tmp_path / "scene"), str(tmp_path / "tiles"),
                num_col=2, num_row=1, visibility_threshold=0.3)

    from gssr_tpu.configs.methods import get_method_config
    config = get_method_config("3dgs")
    config.source_path = str(tmp_path / "tiles")
    config.output_path = str(tmp_path / "out")
    config.experiment_name = "split_run"
    config.trainer.iterations = 2
    config.trainer.test_iterations = []
    config.trainer.save_iterations = [2]
    config.scene.instance_cap = 2048
    config.scene.backend = "reference"
    config.scene.gaussians = config.scene.gaussians.__class__(capacity=256)

    import copy as copy_mod
    import train_split
    monkeypatch.setattr(train_split, "parse_config",
                        lambda: copy_mod.deepcopy(config))
    train_split.main()
    out1 = capsys.readouterr().out
    assert out1.count("=== training") == 2 and "skipping" not in out1

    train_split.main()
    out2 = capsys.readouterr().out
    assert out2.count("=== skipping") == 2 and "=== training" not in out2

    config.retrain = True
    train_split.main()
    out3 = capsys.readouterr().out
    assert out3.count("=== training") == 2


def test_scan_block_matches_per_step(tmp_path):
    """The K-step scan-block trainer path equals per-step training: same
    camera sequence, same losses, same final state (up to float
    reassociation between the scanned and unrolled compilations), with a
    densification boundary INSIDE the horizon so block splitting at
    schedule events is exercised."""
    import dataclasses
    import jax
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import write_synthetic_colmap_scene
    from test_methods_e2e import _small_config
    from gssr_tpu.engine.trainer import Trainer

    d = tmp_path / "scene"
    write_synthetic_colmap_scene(str(d), n_cams=4, n_pts=48,
                                 width=32, height=32)

    def run(tag, scan_block):
        config = _small_config("3dgs", str(d), str(tmp_path / tag))
        config.trainer.iterations = 10
        config.trainer.test_iterations = []
        config.trainer.save_iterations = []
        config.trainer.scan_block = scan_block
        config.scene.gaussians = dataclasses.replace(
            config.scene.gaussians, densification_interval=6,
            densify_from_iter=1, densify_until_iter=9)
        t = Trainer(config)
        t.setup()
        return t.train()

    s1 = run("steps", 1)
    s2 = run("blocks", 4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-3 * scale)
