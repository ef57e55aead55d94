"""GS-SR MLP checkpoint import (models/interop.py)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")


def _make_mlp(cfg_kwargs):
    from gssr_tpu.models.scaffold import ScaffoldGaussianConfig, \
        ScaffoldGaussians
    cfg = ScaffoldGaussianConfig(capacity=128, feat_dim=8, n_offsets=4,
                                 voxel_size=0.1, **cfg_kwargs)
    g = ScaffoldGaussians(cfg, spatial_lr_scale=1.0, num_cameras=5)
    pts = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    state = g.create_from_points(pts)
    return g, state


def _ref_sequentials(mlp):
    """torch modules shaped like the reference's, seeded deterministically."""
    torch.manual_seed(0)

    def seq(w1, w2, act):
        lin1 = torch.nn.Linear(w1.shape[0], w1.shape[1])
        lin2 = torch.nn.Linear(w2.shape[0], w2.shape[1])
        return torch.nn.Sequential(lin1, torch.nn.ReLU(), lin2, act)

    return {
        "opacity_mlp": seq(mlp.op_w1, mlp.op_w2, torch.nn.Tanh()),
        "cov_mlp": seq(mlp.cov_w1, mlp.cov_w2, torch.nn.Identity()),
        "color_mlp": seq(mlp.col_w1, mlp.col_w2, torch.nn.Sigmoid()),
    }


def test_unite_checkpoint_roundtrip(tmp_path):
    from gssr_tpu.models.interop import load_gs_sr_mlp_checkpoint
    import jax.numpy as jnp

    g, state = _make_mlp(dict(appearance_dim=0))
    mlp = state.mlp
    mods = _ref_sequentials(mlp)
    torch.save({k: m.state_dict() for k, m in mods.items()},
               str(tmp_path / "checkpoints.pth"))

    new = load_gs_sr_mlp_checkpoint(str(tmp_path), mlp)
    # transposed-weight mapping: jnp h @ w1 == torch Linear(h)
    x = np.random.default_rng(1).normal(
        size=(7, mlp.op_w1.shape[0])).astype(np.float32)
    want = mods["opacity_mlp"](torch.from_numpy(x)).detach().numpy()
    h = jnp.maximum(jnp.asarray(x) @ new.op_w1 + new.op_b1, 0.0)
    got = np.tanh(np.asarray(h @ new.op_w2 + new.op_b2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_split_jit_checkpoint_roundtrip(tmp_path):
    from gssr_tpu.models.interop import load_gs_sr_mlp_checkpoint

    g, state = _make_mlp(dict(appearance_dim=0))
    mlp = state.mlp
    mods = _ref_sequentials(mlp)
    for key, fname in (("opacity_mlp", "opacity_mlp.pt"),
                       ("cov_mlp", "cov_mlp.pt"),
                       ("color_mlp", "color_mlp.pt")):
        m = mods[key].eval()
        traced = torch.jit.trace(
            m, torch.rand(1, m[0].weight.shape[1]))
        traced.save(str(tmp_path / fname))

    new = load_gs_sr_mlp_checkpoint(str(tmp_path), mlp)
    np.testing.assert_allclose(
        np.asarray(new.cov_w2),
        mods["cov_mlp"][2].weight.detach().numpy().T, atol=1e-6)


def test_shape_mismatch_raises(tmp_path):
    from gssr_tpu.models.interop import load_gs_sr_mlp_checkpoint

    g, state = _make_mlp(dict(appearance_dim=0))
    mlp = state.mlp
    mods = _ref_sequentials(mlp)
    sd = {k: m.state_dict() for k, m in mods.items()}
    # corrupt the hidden width of the cov mlp
    sd["cov_mlp"]["0.weight"] = torch.zeros(3, 3)
    sd["cov_mlp"]["0.bias"] = torch.zeros(3)
    torch.save(sd, str(tmp_path / "checkpoints.pth"))
    with pytest.raises(ValueError, match="cov_w1"):
        load_gs_sr_mlp_checkpoint(str(tmp_path), mlp)


def test_export_import_roundtrip(tmp_path):
    """save_gs_sr_mlp_checkpoint is the exact inverse of the importer."""
    import jax
    from gssr_tpu.models.interop import (load_gs_sr_mlp_checkpoint,
                                         save_gs_sr_mlp_checkpoint)

    g, state = _make_mlp(dict(appearance_dim=6))
    mlp = state.mlp
    out = save_gs_sr_mlp_checkpoint(str(tmp_path / "pc"), mlp)
    assert os.path.basename(out) == "checkpoints.pth"
    back = load_gs_sr_mlp_checkpoint(str(tmp_path / "pc"), mlp)
    for name in mlp._fields:
        if name.startswith("fb_"):
            continue  # not exported without use_feat_bank
        np.testing.assert_array_equal(np.asarray(getattr(back, name)),
                                      np.asarray(getattr(mlp, name)),
                                      err_msg=name)


def test_export_loads_like_reference(tmp_path):
    """The exported checkpoints.pth round-trips through torch Sequentials
    shaped exactly like the reference's load_state_dict path."""
    from gssr_tpu.models.interop import save_gs_sr_mlp_checkpoint

    g, state = _make_mlp(dict(appearance_dim=0))
    mlp = state.mlp
    save_gs_sr_mlp_checkpoint(str(tmp_path), mlp, use_feat_bank=True)
    ckpt = torch.load(str(tmp_path / "checkpoints.pth"),
                      weights_only=True)
    assert set(ckpt) == {"opacity_mlp", "cov_mlp", "color_mlp",
                         "feature_bank_mlp"}
    mods = _ref_sequentials(mlp)
    for key, mod in mods.items():
        mod.load_state_dict(ckpt[key])       # reference load path
    x = torch.from_numpy(
        np.random.default_rng(1).normal(
            size=(3, mlp.op_w1.shape[0])).astype(np.float32))
    ref_out = mods["opacity_mlp"](x).detach().numpy()
    ours = np.tanh(
        np.maximum(np.asarray(x) @ np.asarray(mlp.op_w1)
                   + np.asarray(mlp.op_b1), 0.0)
        @ np.asarray(mlp.op_w2) + np.asarray(mlp.op_b2))
    np.testing.assert_allclose(ref_out, ours, atol=1e-5)
