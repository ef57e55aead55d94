"""Multi-chip training on the virtual 8-device CPU mesh.

Exactness contract: a band-sharded train step must reproduce the
single-device step bit-for-bit up to float reassociation (the per-tile
blend order is unchanged; only the cross-gaussian gradient reduction is
reassociated), and a DP step fed n copies of the SAME camera must match
the single-device step on that camera (pmean of identical grads).
"""
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from synthetic import write_synthetic_colmap_scene
    d = tmp_path_factory.mktemp("pscene")
    write_synthetic_colmap_scene(str(d), n_cams=4, n_pts=48,
                                 width=32, height=32)
    return str(d)


def _scene_for(method, scene_dir, tmp_path, tag):
    from test_methods_e2e import _small_config
    from gssr_tpu.configs.methods import build_scene
    config = _small_config(method, scene_dir, str(tmp_path / tag))
    return build_scene(config)


def _leaves(state):
    import jax
    return [np.asarray(x) for x in jax.tree.leaves(state)]


BAND_METHODS = ["3dgs", "2dgs", "octree-2dgs", "pgsr"]


@pytest.mark.slow
@pytest.mark.parametrize("method", BAND_METHODS)
def test_band_step_matches_single_device(method, scene_dir, tmp_path):
    """3 train steps with tile rows banded over 2 devices == single chip.

    Losses must agree to float precision every step. Params are compared
    at Adam-step scale (5e-3): the cross-device psum reassociates the
    gradient sum, and a last-ulp difference on a near-zero gradient
    component flips Adam's first-step sign, moving that element by +-lr.
    Tight PRE-Adam gradient parity is asserted in test_band_grads_exact.
    """
    import jax

    ref = _scene_for(method, scene_dir, tmp_path, "ref")
    band = _scene_for(method, scene_dir, tmp_path, "band")
    band.setup_parallel("band", devices=jax.devices()[:2])

    s_ref, s_band = ref.state, band.state
    for step in range(1, 4):
        cam_r = ref.dataloader.next_train()
        cam_b = band.dataloader.next_train()
        assert cam_r.uid == cam_b.uid   # seeded samplers agree
        s_ref, m_ref = ref.train_step(s_ref, cam_r, step)
        s_band, m_band = band.train_step(s_band, cam_b, step)
        assert np.isclose(float(m_ref["loss"]), float(m_band["loss"]),
                          atol=1e-5)
    for a, b in zip(_leaves(s_ref), _leaves(s_band)):
        np.testing.assert_allclose(a, b, atol=5e-3,
                                   err_msg=f"{method} band diverged")


def _grad_tree_close(ga, gb, rtol=2e-3):
    import jax
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=rtol * scale, rtol=0)


@pytest.mark.slow
@pytest.mark.parametrize("payload", ["vanilla", "2dgs", "pgsr"])
def test_band_grads_exact(payload, rng):
    """PRE-Adam gradient parity: pmean of per-band parameter grads equals
    the single-device gradient for every rasterizer payload (the ops/band.py
    all_gather-VJP contract), up to reassociation of the reduction."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize
    from gssr_tpu.ops.rasterize2d import rasterize_2d
    from gssr_tpu.ops.rasterize_pgsr import rasterize_pgsr

    W, H = 64, 64
    N = 256
    cam = Camera(uid=0, colmap_id=0, image_name="g",
                 R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 fovx=math.radians(70), fovy=math.radians(55),
                 width=W, height=H).arrays()
    means = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.0, -1.5, (N, 3))),
                         jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32)
    col = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    wimg = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)

    def render(params, band):
        kw = dict(band_axis="band", band_count=4) if band else {}
        m, s, r, o = params
        if payload == "vanilla":
            out = rasterize(m, s, r, o, cam, W, H, bg, colors_precomp=col,
                            instance_cap=1 << 13, backend="reference", **kw)
        elif payload == "2dgs":
            out = rasterize_2d(m, s[:, :2], r, o, cam, W, H, bg,
                               colors_precomp=col, instance_cap=1 << 13,
                               backend="reference", **kw)
        else:
            out = rasterize_pgsr(m, s, r, o, cam, W, H, bg,
                                 colors_precomp=col, instance_cap=1 << 13,
                                 backend="reference", **kw)
        loss = jnp.sum(out.image * wimg)
        if payload != "vanilla":
            loss = loss + jnp.sum(out.normal if payload == "pgsr"
                                  else out.surf_depth)
        return loss

    params = (means, scales, rots, opac)
    g_single = jax.grad(lambda p: render(p, band=False))(params)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("band",))

    def per_device(p):
        g = jax.grad(lambda q: render(q, band=True))(p)
        return jax.tree.map(lambda x: jax.lax.pmean(x, "band"), g)

    g_band = jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(P(),), out_specs=P(),
        check_vma=False))(params)
    _grad_tree_close(g_single, g_band)


@pytest.mark.slow
def test_band_step_matches_single_device_pallas(scene_dir, tmp_path):
    """Band exactness through the PALLAS kernels (interpret mode on CPU):
    the driver-facing claim that the sharded path exercises the real
    blend, not just the jnp reference backend."""
    import dataclasses
    import jax
    from test_methods_e2e import _small_config
    from gssr_tpu.configs.methods import build_scene

    def mk(tag):
        config = _small_config("3dgs", scene_dir, str(tmp_path / tag))
        config.scene.backend = "pallas"
        return build_scene(config)

    ref, band = mk("refp"), mk("bandp")
    band.setup_parallel("band", devices=jax.devices()[:2])
    s_ref, s_band = ref.state, band.state
    for step in range(1, 3):
        cam = ref.dataloader.next_train()
        band.dataloader.next_train()
        s_ref, _ = ref.train_step(s_ref, cam, step)
        s_band, _ = band.train_step(s_band, cam, step)
    for a, b in zip(_leaves(s_ref), _leaves(s_band)):
        np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["3dgs", "octree-2dgs"])
def test_dp_same_camera_matches_single_device(method, scene_dir, tmp_path):
    """DP with n copies of one camera: pmean of identical grads == the
    single-device update (stats denominators accumulate n-fold)."""
    import jax

    ref = _scene_for(method, scene_dir, tmp_path, "refdp")
    dp = _scene_for(method, scene_dir, tmp_path, "dp")
    n = 2
    dp.setup_parallel("dp", devices=jax.devices()[:n])

    cam = ref.dataloader.train_cameras[0]
    s_ref, _ = ref.train_step(ref.state, cam, 1)
    s_dp, m = dp.train_step(dp.state, [cam] * n, 1)
    assert np.isfinite(float(m["loss"]))

    if method == "3dgs":
        np.testing.assert_allclose(np.asarray(s_dp.params.xyz),
                                   np.asarray(s_ref.params.xyz), atol=1e-5)
        # per-device deltas summed: denom counts the camera twice
        np.testing.assert_allclose(np.asarray(s_dp.stats.denom),
                                   n * np.asarray(s_ref.stats.denom),
                                   atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(s_dp.anchors.anchor),
                                   np.asarray(s_ref.anchors.anchor),
                                   atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["dp", "band"])
def test_trainer_parallel_e2e(mode, scene_dir, tmp_path):
    """`train.py octree-2dgs --machine.parallel dp|band` end-to-end on the
    virtual mesh: steps run, densify executes, artifacts save."""
    from test_methods_e2e import _small_config
    from gssr_tpu.engine.trainer import Trainer

    config = _small_config("octree-2dgs", scene_dir, str(tmp_path / mode))
    config.machine.parallel = mode
    config.machine.num_devices = 2
    config.save_config()
    trainer = Trainer(config)
    trainer.setup()
    state = trainer.train()
    assert int(state.n_active) > 0
    ply = config.get_base_dir() / "point_cloud/iteration_8/point_cloud.ply"
    assert ply.exists()


def test_band_render_matches_single_device(rng):
    import jax
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize
    from gssr_tpu.parallel.sharded import build_band_render

    W, H = 64, 64     # 4 tile rows -> bands of 1 on a 4-device mesh
    N = 512
    cam = Camera(uid=0, colmap_id=0, image_name="band",
                 R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 fovx=math.radians(70), fovy=math.radians(55),
                 width=W, height=H)
    means = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-3.5, -1.5, (N, 3))),
                         jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.9, (N,)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (N, 16, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    camarr = cam.arrays()

    render_fn, mesh = build_band_render(
        W, H, instance_cap=1 << 13, sh_degree=3, backend="reference",
        devices=jax.devices()[:4])
    img_band = render_fn(means, scales, rots, opac, sh, camarr, bg)

    out = rasterize(means, scales, rots, opac, camarr, W, H, bg,
                    sh_coeffs=sh, sh_degree=3, instance_cap=1 << 15,
                    backend="reference")
    np.testing.assert_allclose(np.asarray(img_band), np.asarray(out.image),
                               atol=1e-5)


def test_graft_entry_single_chip():
    import jax
    import __graft_entry__ as e
    fn, args = e.entry()
    img = jax.jit(fn)(*args)
    img.block_until_ready()
    assert img.shape == (48, 64, 3)
    assert bool(jax.numpy.isfinite(img).all())


def test_distributed_launch_noop_and_single_process():
    """maybe_initialize_distributed: no-op without config/env; real init
    in a single-process subprocess (coordinator = localhost)."""
    import socket
    import subprocess
    import sys
    from gssr_tpu.configs.base import MachineConfig
    from gssr_tpu.parallel.launch import maybe_initialize_distributed

    m = MachineConfig(num_hosts=3, host_rank=2)
    assert maybe_initialize_distributed(m) is False
    assert (m.num_hosts, m.host_rank) == (3, 2)   # untouched

    # ephemeral port: a fixed one can be squatted by an earlier crashed
    # child whose distributed-service threads keep the process alive
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        f"os.environ['GSSR_COORDINATOR'] = '127.0.0.1:{port}'\n"
        "os.environ['GSSR_NUM_PROCESSES'] = '1'\n"
        "os.environ['GSSR_PROCESS_ID'] = '0'\n"
        # sitecustomize registers the axon TPU plugin at interpreter
        # startup and pins the platform; the config update re-forces CPU
        # (same dance as conftest.py) so distributed init cannot block
        # on a TPU-pool claim
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from gssr_tpu.configs.base import MachineConfig\n"
        "from gssr_tpu.parallel.launch import (\n"
        "    maybe_initialize_distributed, shutdown_distributed)\n"
        "m = MachineConfig()\n"
        "assert maybe_initialize_distributed(m) is True\n"
        "assert (m.num_hosts, m.host_rank) == (1, 0)\n"
        "assert maybe_initialize_distributed(m) is True  # idempotent\n"
        "shutdown_distributed()\n"
        "print('ok', flush=True)\n"
        "os._exit(0)  # service threads must not block interpreter exit\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=240,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-2000:]



@pytest.mark.slow
def test_gshard_step_matches_single_device(scene_dir, tmp_path):
    """Gaussian-sharded training (SURVEY §2.3(b)): 3 train steps with the
    state sharded 1/N per device over 4 devices == the single-device step,
    AND the on-device state is physically 1/N per chip.

    Losses must agree to float precision every step. State leaves are
    compared scale-aware: gshard grads are exact at trace level (the in-op
    all_gather's VJP hands each shard exactly its own gaussians'
    cotangents — asserted tightly in test_gshard_grads_exact), but CPU XLA
    multi-threads its reductions, so near-cancelling first-moment
    components carry run-dependent reassociation noise that Adam then
    amplifies.
    """
    import jax

    ref = _scene_for("3dgs", scene_dir, tmp_path, "gref")
    gsh = _scene_for("3dgs", scene_dir, tmp_path, "gsh")
    n_dev = 4
    gsh.setup_parallel("gshard", devices=jax.devices()[:n_dev])

    s_ref, s_gsh = ref.state, gsh.state
    for step in range(1, 4):
        cam_r = ref.dataloader.next_train()
        cam_g = gsh.dataloader.next_train()
        assert cam_r.uid == cam_g.uid
        s_ref, m_ref = ref.train_step(s_ref, cam_r, step)
        s_gsh, m_gsh = gsh.train_step(s_gsh, cam_g, step)
        assert np.isclose(float(m_ref["loss"]), float(m_gsh["loss"]),
                          atol=1e-5)

    # per-chip state really is 1/N of the capacity axis
    cap = s_gsh.params.xyz.shape[0]
    shards = s_gsh.params.xyz.addressable_shards
    assert len(shards) == n_dev
    assert all(sh.data.shape[0] == cap // n_dev for sh in shards)

    import jax.tree_util as jtu
    paths = jtu.tree_flatten_with_path(s_ref)[0]
    for (path, a), b in zip(paths, _leaves(s_gsh)):
        a = np.asarray(a, np.float32)
        scale = max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            a, b, atol=1e-2 * scale,
            err_msg=f"gshard diverged at {jtu.keystr(path)}")


@pytest.mark.slow
def test_gshard_grads_exact(rng):
    """PRE-Adam gradient parity for the gaussian-sharded render: grads of
    an L1+SSIM loss w.r.t. the SHARDED inputs equal the single-device
    gradient slice-for-slice (the all_gather VJP contract)."""
    import math

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops.rasterize import rasterize
    from gssr_tpu.ops.ssim import l1_loss, ssim

    W, H, N = 64, 64, 256
    cam = Camera(uid=0, colmap_id=0, image_name="g", R=np.eye(3),
                 T=np.array([0.0, 0.0, 3.0]), fovx=math.radians(60),
                 fovy=math.radians(55), width=W, height=H)
    camarr = cam.arrays()
    means = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.2, (N, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (N, 16, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    def loss_of(m, s, sax, sc, ro, op):
        out = rasterize(m, sc, ro, op, camarr, W, H, bg, sh_coeffs=s,
                        sh_degree=2, instance_cap=4096,
                        gauss_shard_axis=sax)
        return (0.8 * l1_loss(out.image, tgt)
                + 0.2 * (1.0 - ssim(out.image, tgt)))

    g_ref = jax.jit(lambda m, s: jax.grad(loss_of, argnums=(0, 1))(
        m, s, None, scales, rots, opac))(means, sh)

    mesh = Mesh(np.array(__import__("jax").devices()[:4]), ("dev",))

    def body(m, s, sc, ro, op):
        return jax.grad(loss_of, argnums=(0, 1))(m, s, "dev", sc, ro, op)

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P("dev"),) * 5,
                               out_specs=(P("dev"),) * 2, check_vma=False))
    g_sh = fn(means, sh, scales, rots, opac)
    _grad_tree_close(g_ref, g_sh)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["scaffold-gs", "octree-2dgs"])
def test_gshard_anchor_step_matches_single_device(method, scene_dir,
                                                  tmp_path):
    """Anchor-sharded training (VERDICT r4 item 6): the scaffold/octree
    state — anchors + feat + offsets + both Adam moments + densify stats —
    lives 1/D per device; the MLP decode runs on the local anchor shard and
    only the decoded splats' compact screen attributes are gathered. Three
    train steps must match the single-device run, and the anchor state must
    physically reside 1/D per chip. Covers both the vanilla (scaffold-gs)
    and surfel (octree-2dgs) rasterizer payloads."""
    import jax

    ref = _scene_for(method, scene_dir, tmp_path, "aref")
    gsh = _scene_for(method, scene_dir, tmp_path, "agsh")
    n_dev = 4
    gsh.setup_parallel("gshard", devices=jax.devices()[:n_dev])

    s_ref, s_gsh = ref.state, gsh.state
    for step in range(1, 4):
        cam_r = ref.dataloader.next_train()
        cam_g = gsh.dataloader.next_train()
        assert cam_r.uid == cam_g.uid
        s_ref, m_ref = ref.train_step(s_ref, cam_r, step)
        s_gsh, m_gsh = gsh.train_step(s_gsh, cam_g, step)
        assert np.isclose(float(m_ref["loss"]), float(m_gsh["loss"]),
                          atol=1e-5), f"step {step}"

    cap = s_gsh.anchors.anchor.shape[0]
    shards = s_gsh.anchors.feat.addressable_shards
    assert len(shards) == n_dev
    assert all(sh.data.shape[0] == cap // n_dev for sh in shards)
    # the replicated MLP really is replicated
    assert s_gsh.mlp.op_w1.addressable_shards[0].data.shape == \
        s_gsh.mlp.op_w1.shape

    import jax.tree_util as jtu
    paths = jtu.tree_flatten_with_path(s_ref)[0]
    for (path, a), b in zip(paths, _leaves(s_gsh)):
        a = np.asarray(a, np.float32)
        if a.size == 0:       # appearance embedding at appearance_dim=0
            continue
        scale = max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            a, b, atol=1e-2 * scale,
            err_msg=f"anchor gshard diverged at {jtu.keystr(path)}")


def test_gshard_refuses_pgsr(scene_dir, tmp_path):
    import jax
    scene = _scene_for("pgsr", scene_dir, tmp_path, "gref2")
    with pytest.raises(NotImplementedError):
        scene.setup_parallel("gshard", devices=jax.devices()[:4])


@pytest.mark.slow
def test_gshard_anchor_grads_exact(scene_dir, tmp_path):
    """PRE-Adam composed-gradient parity for the anchor-sharded decode:
    grads of the full scaffold loss (L1 + SSIM + scaling reg) w.r.t. the
    SHARDED anchors equal the single-device gradient slice-for-slice, and
    the psum'd MLP grads equal the single-device MLP grads. Caught the
    psum-transpose Dx over-count on the scaling regularizer (its transpose
    is itself a psum; the fix routes the gradient through the local
    summand only)."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from jax.sharding import Mesh, PartitionSpec as P
    from gssr_tpu.ops.ssim import l1_loss, ssim

    scene = _scene_for("scaffold-gs", scene_dir, tmp_path, "agref")
    state = scene.state
    cam = scene.dataloader.train_cameras[0]
    cam_arrays, uid = cam.arrays(), jnp.asarray(cam.uid)
    gt = jnp.asarray(cam.image, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    step = 5.0

    def core(anchors, mlp, active, gshard):
        visible = jax.lax.stop_gradient(
            scene.prefilter_anchors(anchors, active, cam_arrays))

        def loss_fn(a, m):
            ng, out = scene.decode_and_render(
                a, m, cam_arrays, uid, visible, active, bg, gshard=gshard)
            lam = scene.config.lambda_dssim
            t = ((1 - lam) * l1_loss(out.image, gt)
                 + lam * (1.0 - ssim(out.image, gt)))
            return t + sum(scene.extra_losses(ng, out, step,
                                              cam_arrays).values())

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(anchors, mlp)

    L0, (ga0, gm0) = jax.jit(
        lambda a, m, act: core(a, m, act, False))(
            state.anchors, state.mlp, state.active)

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dev",))
    scene._pmode, scene._mesh, scene._n_dev = "gshard", mesh, n_dev

    def body(anchors, mlp, active):
        L, (ga, gm) = core(anchors, mlp, active, True)
        return L, ga, jax.tree.map(lambda x: jax.lax.psum(x, "dev"), gm)

    shard = lambda t: jax.tree.map(lambda _: P("dev"), t)
    repl = lambda t: jax.tree.map(lambda _: P(), t)
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(shard(state.anchors), repl(state.mlp), P("dev")),
        out_specs=(P(), shard(state.anchors), repl(state.mlp)),
        check_vma=False))
    L1, ga1, gm1 = fn(state.anchors, state.mlp, state.active)

    assert np.isclose(float(L0), float(L1), rtol=1e-6)
    for tag, g0, g1 in [("anchors", ga0, ga1), ("mlp", gm0, gm1)]:
        for (p, a), b in zip(jtu.tree_flatten_with_path(g0)[0],
                             jax.tree.leaves(g1)):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                continue
            scale = max(float(np.abs(a).max()), 1e-10)
            np.testing.assert_allclose(
                b / scale, a / scale, atol=1e-4,
                err_msg=f"{tag}{jtu.keystr(p)}")
