"""PGSR gaussian model: abs-gradient statistics + budgeted densification.

Parity: /root/reference/gssr/gaussian/pgsr_gaussian.py — second gradient
accumulator fed by the rasterizer's abs screen-space gradients, abs-split
gated by screen radius, global point budget (max_all_points) enforced by
quantile re-thresholding, clone that *samples* a new position, and
out_observe-gated radius statistics.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.models.vanilla import (
    AdamState,
    DensifyStats,
    GaussianParams,
    GaussianState,
    VanillaGaussianConfig,
    VanillaGaussians,
)
from gssr_tpu.utils.general import quat_to_rotmat


@dataclasses.dataclass(frozen=True)
class PGSRGaussianConfig(VanillaGaussianConfig):
    densify_abs_grad_threshold: float = 0.0008
    abs_split_radii2D_threshold: float = 20.0
    max_abs_split_points: int = 50_000
    max_all_points: int = 6_000_000
    percent_dense: float = 0.001


class PGSRGaussians(VanillaGaussians):
    config: PGSRGaussianConfig

    # extra stats ride in a parallel pytree next to DensifyStats
    def init_extra_stats(self, cap):
        return {
            "grad_accum_abs": jnp.zeros(cap, jnp.float32),
            "denom_abs": jnp.zeros(cap, jnp.float32),
            "max_weight": jnp.zeros(cap, jnp.float32),
        }

    def update_stats_pgsr(self, stats: DensifyStats, extra, radii,
                          mean2d_grad, mean2d_abs_grad, observe, grad_scale):
        """add_densification_stats + observe-gated radius max
        (pgsr_gaussian.py:157-182).

        grad_scale: [2] NDC conversion (see VanillaGaussians.ndc_grad_scale).
        """
        visible = radii > 0
        obs_mask = visible & (observe > 0)
        gnorm = jnp.linalg.norm(mean2d_grad[:, :2] * grad_scale, axis=-1)
        gnorm_abs = jnp.linalg.norm(mean2d_abs_grad[:, :2] * grad_scale,
                                    axis=-1)
        new_stats = DensifyStats(
            max_radii2d=jnp.where(obs_mask,
                                  jnp.maximum(stats.max_radii2d,
                                              radii.astype(jnp.float32)),
                                  stats.max_radii2d),
            grad_accum=jnp.where(visible, stats.grad_accum + gnorm,
                                 stats.grad_accum),
            denom=jnp.where(visible, stats.denom + 1.0, stats.denom))
        new_extra = {
            "grad_accum_abs": jnp.where(
                visible, extra["grad_accum_abs"] + gnorm_abs,
                extra["grad_accum_abs"]),
            "denom_abs": jnp.where(visible, extra["denom_abs"] + 1.0,
                                   extra["denom_abs"]),
            "max_weight": extra["max_weight"],
        }
        return new_stats, new_extra

    @staticmethod
    def dp_merge_extra(old, local, axis):
        """DP merge of the abs-grad accumulators (sums add per-device
        deltas, max_weight reduces directly)."""
        return {
            "grad_accum_abs": old["grad_accum_abs"] + jax.lax.psum(
                local["grad_accum_abs"] - old["grad_accum_abs"], axis),
            "denom_abs": old["denom_abs"] + jax.lax.psum(
                local["denom_abs"] - old["denom_abs"], axis),
            "max_weight": jax.lax.pmax(local["max_weight"], axis),
        }

    @staticmethod
    def _budget_reselect(sel, grads, n_active, budget, cap):
        """Quantile re-thresholding when a selection would exceed the global
        point budget (pgsr_gaussian.py:66-77)."""
        want = jnp.sum(sel.astype(jnp.int32))
        over = n_active + want > budget
        limited = jnp.maximum(budget - n_active, 0)
        ratio = jnp.clip(limited.astype(jnp.float32)
                         / jnp.maximum(n_active.astype(jnp.float32), 1.0),
                         0.0, 1.0)
        gtmp = jnp.where(sel, grads, 0.0)
        thr = jnp.quantile(gtmp, 1.0 - ratio)
        sel2 = gtmp > thr
        return jnp.where(over, sel2, sel)

    def densify_and_prune(self, state: GaussianState, key,
                          use_size_prune, extra=None) -> GaussianState:
        """PGSR clone/split with abs-gradient channel and point budget."""
        cfg = self.config
        extent = self.spatial_lr_scale
        p = state.params
        cap = p.xyz.shape[0]
        active = state.active
        assert extra is not None

        grads = jnp.nan_to_num(
            state.stats.grad_accum / jnp.maximum(state.stats.denom, 1e-12))
        grads_abs = jnp.nan_to_num(
            extra["grad_accum_abs"] / jnp.maximum(extra["denom_abs"], 1e-12))
        scaling = self.get_scaling(p)
        max_scale = jnp.max(scaling, axis=-1)
        opacity = self.get_opacity(p)[:, 0]
        small = max_scale <= cfg.percent_dense * extent
        n0 = state.n_active

        # ---- clone (samples a new position, unlike vanilla) ----------
        clone_mask = active & (grads >= cfg.densify_grad_threshold) & small
        clone_mask = self._budget_reselect(clone_mask, grads, n0,
                                           cfg.max_all_points, cap) & active

        # ---- split (primary + abs channel) ---------------------------
        split_base = active & (grads >= cfg.densify_grad_threshold) & ~small
        want_split = jnp.sum(split_base.astype(jnp.int32))
        over = n0 + want_split > cfg.max_all_points
        split_budget = self._budget_reselect(
            split_base, grads, n0, cfg.max_all_points, cap) & active

        abs_gate = (active & ~small & ~split_base
                    & (state.stats.max_radii2d
                       > cfg.abs_split_radii2D_threshold))
        abs_sel = abs_gate & (grads_abs >= cfg.densify_abs_grad_threshold)
        limited_abs = jnp.minimum(
            jnp.maximum(cfg.max_all_points - n0 - want_split, 0),
            cfg.max_abs_split_points)
        abs_sel = self._budget_reselect(abs_sel, grads_abs, n0,
                                        n0 + limited_abs, cap) & abs_gate
        split_mask = jnp.where(over, split_budget, split_base | abs_sel)

        prune = active & (opacity < cfg.opacity_cull_threshold)
        big_ws = max_scale > 0.1 * extent
        big_vs = state.stats.max_radii2d > 20.0
        prune = jnp.where(use_size_prune,
                          prune | (active & (big_ws | big_vs)), prune)
        new_active = active & ~prune & ~split_mask

        free = ~new_active
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        free_list = jnp.full((cap,), cap, jnp.int32).at[
            jnp.where(free, free_rank, cap)].set(
                jnp.arange(cap, dtype=jnp.int32), mode="drop")
        n_clone = jnp.sum(clone_mask.astype(jnp.int32))
        n_split = jnp.sum(split_mask.astype(jnp.int32))
        clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
        split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1

        def dest(mask, rank, offset):
            rk = jnp.where(mask, rank + offset, cap)
            return jnp.where(rk < cap, free_list[jnp.minimum(rk, cap - 1)],
                             cap)

        dest_clone = dest(clone_mask, clone_rank, 0)
        dest_child1 = dest(split_mask, split_rank, n_clone)
        dest_child2 = dest(split_mask, split_rank, n_clone + n_split)

        R = quat_to_rotmat(p.rotation)
        k_clone, k1, k2 = jax.random.split(key, 3)
        child_scaling = jnp.log(scaling / (0.8 * 2.0))

        def place(acc: GaussianParams, dst, xyz, scal):
            src = GaussianParams(
                xyz=xyz, f_dc=p.f_dc, f_rest=p.f_rest, scaling=scal,
                rotation=p.rotation, opacity=p.opacity)
            return GaussianParams(*[
                d.at[dst].set(s, mode="drop") for d, s in zip(acc, src)])

        def sampled_xyz(k):
            noise = jax.random.normal(k, (cap, 3))
            return p.xyz + jnp.einsum("nij,nj->ni", R, noise * scaling)

        new_params = place(p, dest_clone, sampled_xyz(k_clone), p.scaling)
        new_params = place(new_params, dest_child1, sampled_xyz(k1),
                           child_scaling)
        new_params = place(new_params, dest_child2, sampled_xyz(k2),
                           child_scaling)

        placed = jnp.zeros(cap, bool)
        for dst in (dest_clone, dest_child1, dest_child2):
            placed = placed.at[dst].set(True, mode="drop")
        final_active = new_active | placed
        keep = new_active

        def reset_new(x):
            kk = keep.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(kk, x, jnp.zeros_like(x))

        adam = AdamState(m=jax.tree.map(reset_new, state.adam.m),
                         v=jax.tree.map(reset_new, state.adam.v),
                         count=state.adam.count)
        new_params = new_params._replace(
            opacity=jnp.where((~final_active)[:, None], -10.0,
                              new_params.opacity))
        stats = DensifyStats(*(jnp.zeros_like(s) for s in state.stats))
        new_extra = jax.tree.map(jnp.zeros_like, extra)
        new_state = GaussianState(new_params, adam, stats, final_active,
                                  jnp.sum(final_active.astype(jnp.int32)))
        return new_state, new_extra
