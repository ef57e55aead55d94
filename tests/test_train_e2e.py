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
