"""Vanilla 3DGS gaussian model: fixed-capacity functional state.

Parity: /root/reference/gssr/gaussian/vanilla_gaussian.py — same parameter
groups, LR schedules, adaptive density control (clone / split / prune /
opacity reset) and PLY schema. TPU re-design: parameters live in
fixed-capacity arrays with an `active` mask; densification is a jitted
masked-scatter into free slots instead of tensor re-allocation + optimizer
surgery (vanilla_gaussian.py:280-370), so shapes stay static and the train
step never recompiles. Adam moments for new points start at zero exactly
like the reference's cat_tensors_to_optimizer.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.ops.knn import mean_knn_dist2_host
from gssr_tpu.ops.sh import rgb_to_sh
from gssr_tpu.utils.general import expon_lr, inverse_sigmoid, quat_to_rotmat


@dataclasses.dataclass(frozen=True)
class VanillaGaussianConfig:
    max_sh_degree: int = 3
    percent_dense: float = 0.01
    sampling_ratio: int = 1

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001

    oneup_sh_interval: int = 1000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    opacity_cull_threshold: float = 0.005

    capacity: int = 0                 # 0 => derived from init point count
    capacity_multiplier: float = 8.0


class GaussianParams(NamedTuple):
    xyz: jnp.ndarray        # [C,3]
    f_dc: jnp.ndarray       # [C,1,3]
    f_rest: jnp.ndarray     # [C,K-1,3]
    scaling: jnp.ndarray    # [C,3] log-scale
    rotation: jnp.ndarray   # [C,4] unnormalized quats
    opacity: jnp.ndarray    # [C,1] pre-sigmoid


class AdamState(NamedTuple):
    m: GaussianParams
    v: GaussianParams
    count: jnp.ndarray      # [] int32


class DensifyStats(NamedTuple):
    max_radii2d: jnp.ndarray   # [C] float32
    grad_accum: jnp.ndarray    # [C] float32 — sum |dL/dmean2d|
    denom: jnp.ndarray         # [C] float32


class GaussianState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    stats: DensifyStats
    active: jnp.ndarray        # [C] bool
    n_active: jnp.ndarray      # [] int32


def _zeros_like_params(p: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.zeros_like, p)


class VanillaGaussians:
    """Config + static scene info; all state-changing ops are pure."""

    param_lr_names = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")
    scale_dim = 3  # 2 for surfel (2DGS) models

    def __init__(self, config: VanillaGaussianConfig,
                 spatial_lr_scale: float = 1.0):
        self.config = config
        self.spatial_lr_scale = float(spatial_lr_scale)

    # ---------------- activations -------------------------------------
    @staticmethod
    def get_scaling(params: GaussianParams):
        return jnp.exp(params.scaling)

    @staticmethod
    def get_opacity(params: GaussianParams):
        return jax.nn.sigmoid(params.opacity)

    @staticmethod
    def get_rotation(params: GaussianParams):
        return params.rotation / (jnp.linalg.norm(
            params.rotation, axis=-1, keepdims=True) + 1e-12)

    @staticmethod
    def get_features(params: GaussianParams):
        """[C, K, 3] SH coefficients, DC first."""
        return jnp.concatenate([params.f_dc, params.f_rest], axis=1)

    # ---------------- init --------------------------------------------
    def create_from_points(self, points: np.ndarray, colors: np.ndarray,
                           capacity: Optional[int] = None) -> GaussianState:
        cfg = self.config
        points = np.asarray(points, np.float32)[::cfg.sampling_ratio]
        colors = np.asarray(colors, np.float32)[::cfg.sampling_ratio]
        n = len(points)
        cap = capacity or cfg.capacity or int(
            max(n * cfg.capacity_multiplier, 1 << 14))
        cap = -(-cap // 128) * 128      # chunk-friendly

        K = (cfg.max_sh_degree + 1) ** 2
        dist2 = np.maximum(mean_knn_dist2_host(points), 1e-7)
        scales = np.log(np.sqrt(dist2))[:, None].repeat(self.scale_dim, axis=1)

        def alloc(arr, shape, fill=0.0):
            out = np.full((cap,) + shape, fill, np.float32)
            out[:n] = arr
            return jnp.asarray(out)

        params = GaussianParams(
            xyz=alloc(points, (3,)),
            f_dc=alloc(np.asarray(rgb_to_sh(colors))[:, None, :], (1, 3)),
            f_rest=jnp.zeros((cap, K - 1, 3), jnp.float32),
            scaling=alloc(scales, (self.scale_dim,), fill=-10.0),
            rotation=alloc(np.tile([1.0, 0, 0, 0], (n, 1)), (4,), fill=1.0),
            opacity=alloc(
                np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.1)))),
                (1,), fill=-10.0),
        )
        active = jnp.arange(cap) < n
        adam = AdamState(m=_zeros_like_params(params),
                         v=_zeros_like_params(params),
                         count=jnp.zeros((), jnp.int32))
        stats = DensifyStats(
            max_radii2d=jnp.zeros(cap, jnp.float32),
            grad_accum=jnp.zeros(cap, jnp.float32),
            denom=jnp.zeros(cap, jnp.float32))
        return GaussianState(params, adam, stats, active,
                             jnp.asarray(n, jnp.int32))

    # ---------------- optimizer ---------------------------------------
    def learning_rates(self, step):
        cfg = self.config
        return GaussianParams(
            xyz=expon_lr(step,
                         cfg.position_lr_init * self.spatial_lr_scale,
                         cfg.position_lr_final * self.spatial_lr_scale,
                         lr_delay_mult=cfg.position_lr_delay_mult,
                         max_steps=cfg.position_lr_max_steps),
            f_dc=jnp.asarray(cfg.feature_lr),
            f_rest=jnp.asarray(cfg.feature_lr / 20.0),
            scaling=jnp.asarray(cfg.scaling_lr),
            rotation=jnp.asarray(cfg.rotation_lr),
            opacity=jnp.asarray(cfg.opacity_lr),
        )

    @staticmethod
    def adam_step(params: GaussianParams, grads: GaussianParams,
                  adam: AdamState, lrs: GaussianParams,
                  b1=0.9, b2=0.999, eps=1e-15):
        """Per-group Adam, eps matching the reference (trainer uses 1e-15)."""
        count = adam.count + 1
        t = count.astype(jnp.float32)

        def upd(p, g, m, v, lr):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mhat = m / (1 - b1 ** t)
            vhat = v / (1 - b2 ** t)
            p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
            return p, m, v

        cls = type(params)
        triples = [upd(p, g, m, v, lr) for p, g, m, v, lr in
                   zip(params, grads, adam.m, adam.v, lrs)]
        new_p = cls(*[t[0] for t in triples])
        new_m = cls(*[t[1] for t in triples])
        new_v = cls(*[t[2] for t in triples])
        return new_p, AdamState(new_m, new_v, count)

    # ---------------- densification -----------------------------------
    @staticmethod
    def ndc_grad_scale(width, height):
        """Pixel-grad -> reference NDC-grad conversion factor.

        The reference CUDA backward returns dL/dmean2D in NDC units —
        pixel grads scaled by 0.5*W / 0.5*H (backward.cu:460-461,545-546) —
        and densify_grad_threshold (0.0002) is calibrated to that scale.
        Our rasterizer's mean2d hook is in pixel units, so densification
        statistics must multiply by this factor before taking the norm.
        """
        return jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)

    @staticmethod
    def dp_merge_stats(old: DensifyStats, local: DensifyStats, axis):
        """Merge per-device stat updates under camera-batch DP: each device
        accumulated its own camera's delta on top of `old`; sums add the
        deltas, the radius max reduces directly."""
        return DensifyStats(
            max_radii2d=jax.lax.pmax(local.max_radii2d, axis),
            grad_accum=old.grad_accum + jax.lax.psum(
                local.grad_accum - old.grad_accum, axis),
            denom=old.denom + jax.lax.psum(local.denom - old.denom, axis))

    @staticmethod
    def update_stats(stats: DensifyStats, radii, mean2d_grad, grad_scale):
        """Per-step statistics accumulation (add_densification_stats).

        grad_scale: [2] = ndc_grad_scale(W, H); converts the pixel-space
        mean2d gradient into the reference's NDC-grad convention.
        """
        visible = radii > 0
        gnorm = jnp.linalg.norm(mean2d_grad[:, :2] * grad_scale, axis=-1)
        return DensifyStats(
            max_radii2d=jnp.where(visible,
                                  jnp.maximum(stats.max_radii2d,
                                              radii.astype(jnp.float32)),
                                  stats.max_radii2d),
            grad_accum=jnp.where(visible, stats.grad_accum + gnorm,
                                 stats.grad_accum),
            denom=jnp.where(visible, stats.denom + 1.0, stats.denom))

    def densify_and_prune(self, state: GaussianState, key,
                          use_size_prune) -> GaussianState:
        """Clone + split + prune, all masked, static shapes.

        Matches vanilla_gaussian.densify_and_prune: clone small
        high-gradient gaussians in place; split large high-gradient ones
        into 2 children sampled from the gaussian (original removed); prune
        low-opacity and oversized ones. New points land in free capacity
        slots via rank-scatter; Adam moments and stats start at zero.
        """
        cfg = self.config
        extent = self.spatial_lr_scale
        p = state.params
        cap = p.xyz.shape[0]
        active = state.active

        grads = state.stats.grad_accum / jnp.maximum(state.stats.denom, 1.0)
        grads = jnp.nan_to_num(grads)
        scaling = self.get_scaling(p)
        max_scale = jnp.max(scaling, axis=-1)
        opacity = self.get_opacity(p)[:, 0]

        hot = active & (grads >= cfg.densify_grad_threshold)
        small = max_scale <= cfg.percent_dense * extent
        clone_mask = hot & small
        split_mask = hot & ~small

        prune = active & (opacity < cfg.opacity_cull_threshold)
        big_ws = max_scale > 0.1 * extent
        big_vs = state.stats.max_radii2d > 20.0
        prune = jnp.where(use_size_prune, prune | (active & (big_ws | big_vs)),
                          prune)
        # split originals are removed
        new_active = active & ~prune & ~split_mask

        # --- free-slot allocation ------------------------------------
        free = ~new_active
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1       # rank per slot
        free_list = jnp.full((cap,), cap, jnp.int32).at[
            jnp.where(free, free_rank, cap)].set(
                jnp.arange(cap, dtype=jnp.int32), mode="drop")   # rank -> slot

        n_clone = jnp.sum(clone_mask.astype(jnp.int32))
        n_split = jnp.sum(split_mask.astype(jnp.int32))

        clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
        split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1

        def dest(mask, rank, offset):
            r = jnp.where(mask, rank + offset, cap)
            return jnp.where(r < cap, free_list[jnp.minimum(r, cap - 1)], cap)

        dest_clone = dest(clone_mask, clone_rank, 0)
        dest_child1 = dest(split_mask, split_rank, n_clone)
        dest_child2 = dest(split_mask, split_rank, n_clone + n_split)

        # --- child sampling (split) ----------------------------------
        R = quat_to_rotmat(p.rotation)                           # [C,3,3]
        noise = jax.random.normal(key, (2, cap, self.scale_dim))
        child_scaling = jnp.log(scaling / (0.8 * 2.0))

        def place(acc: GaussianParams, dst, xyz_override=None,
                  scaling_override=None):
            # dst already carries the cap sentinel where the source mask is
            # false; mode="drop" discards those rows.
            src = GaussianParams(
                xyz=xyz_override if xyz_override is not None else p.xyz,
                f_dc=p.f_dc, f_rest=p.f_rest,
                scaling=(scaling_override if scaling_override is not None
                         else p.scaling),
                rotation=p.rotation, opacity=p.opacity)
            return GaussianParams(*[
                d.at[dst].set(s, mode="drop") for d, s in zip(acc, src)])

        new_params = place(p, dest_clone)
        for c, dst in ((0, dest_child1), (1, dest_child2)):
            samples = self.split_displacement(R, scaling, noise[c])
            new_params = place(new_params, dst,
                               xyz_override=p.xyz + samples,
                               scaling_override=child_scaling)

        # --- activity + state reset ----------------------------------
        placed = jnp.zeros(cap, bool)
        for dst in (dest_clone, dest_child1, dest_child2):
            placed = placed.at[dst].set(True, mode="drop")
        final_active = new_active | placed

        # zero adam moments for new slots, keep for surviving ones
        keep = new_active

        def reset_new(x):
            k = keep.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(k, x, jnp.zeros_like(x))

        adam = AdamState(
            m=jax.tree.map(reset_new, state.adam.m),
            v=jax.tree.map(reset_new, state.adam.v),
            count=state.adam.count)
        # deactivate params in dead slots so they render as nothing
        dead = ~final_active
        new_params = new_params._replace(
            opacity=jnp.where(dead[:, None], -10.0, new_params.opacity))

        stats = DensifyStats(*(jnp.zeros_like(s) for s in state.stats))
        return GaussianState(new_params, adam, stats, final_active,
                             jnp.sum(final_active.astype(jnp.int32)))

    def split_displacement(self, R, scaling, noise):
        """World-space sample offset for split children; surfel models
        restrict sampling to the disk plane (twod_gaussian.py:22-46)."""
        return jnp.einsum("nij,nj->ni", R, noise * scaling)

    def reset_opacity(self, state: GaussianState) -> GaussianState:
        """Clamp opacity to <=0.01 and reset its Adam moments."""
        new_op = inverse_sigmoid(jnp.minimum(
            self.get_opacity(state.params), 0.01))
        params = state.params._replace(opacity=new_op)
        adam = state.adam._replace(
            m=state.adam.m._replace(opacity=jnp.zeros_like(new_op)),
            v=state.adam.v._replace(opacity=jnp.zeros_like(new_op)))
        return state._replace(params=params, adam=adam)

    def active_sh_degree(self, step: int) -> int:
        return min(step // self.config.oneup_sh_interval,
                   self.config.max_sh_degree)

    # ---------------- serialization -----------------------------------
    def save_ply(self, state: GaussianState, path: str):
        """3DGS-ecosystem PLY schema (vanilla_gaussian.save_gaussians)."""
        from gssr_tpu.dataio.ply import write_ply
        active = np.asarray(state.active)
        p = jax.tree.map(lambda x: np.asarray(x)[active], state.params)
        n = p.xyz.shape[0]
        cols = {}
        for i, k in enumerate("xyz"):
            cols[k] = p.xyz[:, i]
        for k in ("nx", "ny", "nz"):
            cols[k] = np.zeros(n, np.float32)
        f_dc = p.f_dc.transpose(0, 2, 1).reshape(n, -1)     # channel-major
        for i in range(f_dc.shape[1]):
            cols[f"f_dc_{i}"] = f_dc[:, i]
        f_rest = p.f_rest.transpose(0, 2, 1).reshape(n, -1)
        for i in range(f_rest.shape[1]):
            cols[f"f_rest_{i}"] = f_rest[:, i]
        cols["opacity"] = p.opacity[:, 0]
        for i in range(self.scale_dim):
            cols[f"scale_{i}"] = p.scaling[:, i]
        for i in range(4):
            cols[f"rot_{i}"] = p.rotation[:, i]
        write_ply(path, {k: v.astype(np.float32) for k, v in cols.items()})

    def load_ply(self, path: str, capacity: Optional[int] = None) -> GaussianState:
        from gssr_tpu.dataio.ply import read_ply
        cols = read_ply(path)
        n = len(cols["x"])
        K = (self.config.max_sh_degree + 1) ** 2
        cap = capacity or self.config.capacity or -(-int(
            n * self.config.capacity_multiplier) // 128) * 128
        xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)
        nrest = 3 * (K - 1)
        f_rest = np.stack([cols[f"f_rest_{i}"] for i in range(nrest)], axis=1)
        f_rest = f_rest.reshape(n, 3, K - 1).transpose(0, 2, 1)
        scaling = np.stack([cols[f"scale_{i}"]
                            for i in range(self.scale_dim)], axis=1)
        rotation = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)
        opacity = cols["opacity"][:, None]

        def alloc(a, fill=0.0):
            out = np.full((cap,) + a.shape[1:], fill, np.float32)
            out[:n] = a
            return jnp.asarray(out)

        params = GaussianParams(
            xyz=alloc(xyz), f_dc=alloc(f_dc[:, :, None].transpose(0, 2, 1)),
            f_rest=alloc(f_rest), scaling=alloc(scaling, fill=-10.0),
            rotation=alloc(rotation, fill=1.0), opacity=alloc(opacity, fill=-10.0))
        adam = AdamState(m=_zeros_like_params(params),
                         v=_zeros_like_params(params),
                         count=jnp.zeros((), jnp.int32))
        stats = DensifyStats(jnp.zeros(cap, jnp.float32),
                             jnp.zeros(cap, jnp.float32),
                             jnp.zeros(cap, jnp.float32))
        return GaussianState(params, adam, stats,
                             jnp.arange(cap) < n, jnp.asarray(n, jnp.int32))
