"""Scaffold-GS: anchors + per-anchor neural-gaussian MLP decode.

Parity: /root/reference/gssr/gaussian/scaffold_gaussian.py and the decode in
scaffold_scene.generate_neural_gaussians (scaffold_scene.py:27-120) — same
MLP architectures (feat->feat->K heads with tanh/sigmoid/linear), LR
schedules, statistics, multi-resolution anchor growing with voxel dedup, and
opacity-accum pruning.

TPU re-design: anchors are fixed-capacity arrays; the decode runs dense over
the whole anchor capacity as batched matmuls (MXU) with masks instead of the
reference's boolean compaction — the rasterizer consumes the [CA*K] slots
with an active mask, so no gathers sit on the hot path. Anchor growing uses
sort/hash voxel dedup (ops/voxel.py) and rank-scatter into free slots.
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.models.vanilla import AdamState, VanillaGaussians
from gssr_tpu.ops.knn import mean_knn_dist2_host
from gssr_tpu.ops.voxel import (
    KEY_MAX,
    dedup_against,
    hash_coords,
    segment_max_sorted,
    voxelize_points_host,
)
from gssr_tpu.utils.general import expon_lr, inverse_sigmoid

_WARNED_NO_TORCH = False


@dataclasses.dataclass(frozen=True)
class ScaffoldGaussianConfig:
    max_sh_degree: int = 3          # unused (colors from MLP); kept for parity
    percent_dense: float = 0.01
    sampling_ratio: int = 1

    feat_dim: int = 32
    n_offsets: int = 10
    voxel_size: float = 0.001       # <=0: use median 3-NN distance
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4

    start_stat: int = 500
    densification_interval: int = 100
    densify_from_iter: int = 1500
    densify_until_iter: int = 15_000
    success_threshold: float = 0.8
    densify_grad_threshold: float = 0.0002
    opacity_cull_threshold: float = 0.005

    use_feat_bank: bool = False
    appearance_dim: int = 32
    view_dim: int = 3
    add_opacity_dist: bool = False
    add_cov_dist: bool = False
    add_color_dist: bool = False

    position_lr_init: float = 0.0
    position_lr_final: float = 0.0
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0075
    opacity_lr: float = 0.02
    scaling_lr: float = 0.007
    rotation_lr: float = 0.002
    offset_lr_init: float = 0.01
    offset_lr_final: float = 0.0001
    offset_lr_delay_mult: float = 0.01
    offset_lr_max_steps: int = 30_000
    mlp_opacity_lr_init: float = 0.002
    mlp_opacity_lr_final: float = 0.00002
    mlp_opacity_lr_max_steps: int = 30_000
    mlp_cov_lr_init: float = 0.004
    mlp_cov_lr_final: float = 0.004
    mlp_cov_lr_max_steps: int = 30_000
    mlp_color_lr_init: float = 0.008
    mlp_color_lr_final: float = 0.00005
    mlp_color_lr_max_steps: int = 30_000
    mlp_featurebank_lr_init: float = 0.01
    mlp_featurebank_lr_final: float = 0.00001
    mlp_featurebank_lr_max_steps: int = 30_000
    appearance_lr_init: float = 0.05
    appearance_lr_final: float = 0.0005
    appearance_lr_max_steps: int = 30_000

    capacity: int = 0
    capacity_multiplier: float = 4.0
    # compact visible anchors to a static budget of
    # round128(capacity * visible_budget_factor) rows before the MLP
    # decode (the reference decodes only compacted visible anchors,
    # scaffold_scene.py:27-40; a dense decode over the full capacity
    # wastes 4-10x MLP FLOPs). <=0 or >=1 disables compaction.
    visible_budget_factor: float = 0.5


class AnchorParams(NamedTuple):
    anchor: jnp.ndarray       # [CA,3]
    offset: jnp.ndarray       # [CA,K,3]
    feat: jnp.ndarray         # [CA,F]
    scaling: jnp.ndarray      # [CA,6] log
    rotation: jnp.ndarray     # [CA,4] (frozen)
    opacity: jnp.ndarray      # [CA,1] (frozen)


class MLPParams(NamedTuple):
    op_w1: jnp.ndarray
    op_b1: jnp.ndarray
    op_w2: jnp.ndarray
    op_b2: jnp.ndarray
    cov_w1: jnp.ndarray
    cov_b1: jnp.ndarray
    cov_w2: jnp.ndarray
    cov_b2: jnp.ndarray
    col_w1: jnp.ndarray
    col_b1: jnp.ndarray
    col_w2: jnp.ndarray
    col_b2: jnp.ndarray
    fb_w1: jnp.ndarray
    fb_b1: jnp.ndarray
    fb_w2: jnp.ndarray
    fb_b2: jnp.ndarray
    appearance: jnp.ndarray   # [num_cams, A] (or [1,0])


class ScaffoldStats(NamedTuple):
    opacity_accum: jnp.ndarray        # [CA]
    anchor_denom: jnp.ndarray         # [CA]
    offset_grad_accum: jnp.ndarray    # [CA,K]
    offset_denom: jnp.ndarray         # [CA,K]


class ScaffoldState(NamedTuple):
    anchors: AnchorParams
    mlp: MLPParams
    adam_anchor: AdamState            # over AnchorParams
    adam_mlp: AdamState               # over MLPParams
    stats: ScaffoldStats
    active: jnp.ndarray               # [CA]
    n_active: jnp.ndarray


class NeuralGaussians(NamedTuple):
    """Decoded per-offset gaussians, flattened to [VB*K] with a mask.

    VB is the static visible-anchor budget when compaction is on (see
    ScaffoldGaussianConfig.visible_budget_factor), else the full anchor
    capacity CA. anchor_idx/valid map compacted rows back to anchor slots
    for the densification statistics."""
    xyz: jnp.ndarray
    color: jnp.ndarray
    opacity: jnp.ndarray       # masked neural opacity (0 where off)
    scaling: jnp.ndarray       # [VB*K,3] activated
    rotation: jnp.ndarray      # [VB*K,4]
    mask: jnp.ndarray          # [VB*K] bool — visible & op>0 & active
    neural_opacity: jnp.ndarray  # [VB*K] raw tanh output
    anchor_idx: jnp.ndarray = None  # [VB] int32 source anchor slot
    valid: jnp.ndarray = None       # [VB] bool — slot holds a real anchor
    vb_overflow: jnp.ndarray = None  # [] bool — visible count exceeded VB


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound)
    return w, b


class ScaffoldGaussians:
    def __init__(self, config: ScaffoldGaussianConfig,
                 spatial_lr_scale: float = 1.0, num_cameras: int = 1):
        self.config = config
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.num_cameras = num_cameras
        self.voxel_size = config.voxel_size  # may be set at init

    # ------------------------------------------------------------------
    @staticmethod
    def get_scaling(anchors: AnchorParams):
        return jnp.exp(anchors.scaling)

    @staticmethod
    def get_rotation(anchors: AnchorParams):
        return anchors.rotation / (jnp.linalg.norm(
            anchors.rotation, axis=-1, keepdims=True) + 1e-12)

    # ------------------------------------------------------------------
    def create_from_points(self, points: np.ndarray, colors=None,
                           capacity: Optional[int] = None,
                           seed: int = 0) -> ScaffoldState:
        cfg = self.config
        points = np.asarray(points, np.float64)[::cfg.sampling_ratio]
        if self.voxel_size <= 0:
            d2 = mean_knn_dist2_host(points)
            self.voxel_size = float(np.median(np.sqrt(d2)))
        pts = voxelize_points_host(points, self.voxel_size)
        n = len(pts)
        cap = capacity or cfg.capacity or int(
            max(n * cfg.capacity_multiplier, 1 << 12))
        cap = -(-cap // 128) * 128
        K, F = cfg.n_offsets, cfg.feat_dim

        dist2 = np.maximum(mean_knn_dist2_host(pts), 1e-7)
        scales = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

        def alloc(arr, shape, fill=0.0):
            out = np.full((cap,) + shape, fill, np.float32)
            out[:n] = arr
            return jnp.asarray(out)

        anchors = AnchorParams(
            anchor=alloc(pts, (3,)),
            offset=jnp.zeros((cap, K, 3), jnp.float32),
            feat=jnp.zeros((cap, F), jnp.float32),
            scaling=alloc(scales, (6,), fill=-10.0),
            rotation=alloc(np.tile([1.0, 0, 0, 0], (n, 1)), (4,), fill=1.0),
            opacity=jnp.full((cap, 1), float(np.log(0.1 / 0.9)), jnp.float32),
        )

        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 8)
        od = 1 if cfg.add_opacity_dist else 0
        cd = 1 if cfg.add_cov_dist else 0
        cld = 1 if cfg.add_color_dist else 0
        vd = cfg.view_dim
        A = cfg.appearance_dim
        op_w1, op_b1 = _linear_init(ks[0], F + vd + od, F)
        op_w2, op_b2 = _linear_init(ks[1], F, K)
        cov_w1, cov_b1 = _linear_init(ks[2], F + vd + cd, F)
        cov_w2, cov_b2 = _linear_init(ks[3], F, 7 * K)
        col_w1, col_b1 = _linear_init(ks[4], F + vd + cld + A, F)
        col_w2, col_b2 = _linear_init(ks[5], F, 3 * K)
        fb_w1, fb_b1 = _linear_init(ks[6], vd + 1, F)
        fb_w2, fb_b2 = _linear_init(ks[7], F, 3)
        appearance = (jnp.zeros((self.num_cameras, A), jnp.float32) if A > 0
                      else jnp.zeros((1, 0), jnp.float32))
        mlp = MLPParams(op_w1, op_b1, op_w2, op_b2,
                        cov_w1, cov_b1, cov_w2, cov_b2,
                        col_w1, col_b1, col_w2, col_b2,
                        fb_w1, fb_b1, fb_w2, fb_b2, appearance)

        zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)
        stats = ScaffoldStats(
            opacity_accum=jnp.zeros(cap, jnp.float32),
            anchor_denom=jnp.zeros(cap, jnp.float32),
            offset_grad_accum=jnp.zeros((cap, K), jnp.float32),
            offset_denom=jnp.zeros((cap, K), jnp.float32))
        return ScaffoldState(
            anchors=anchors, mlp=mlp,
            adam_anchor=AdamState(zeros_like(anchors), zeros_like(anchors),
                                  jnp.zeros((), jnp.int32)),
            adam_mlp=AdamState(zeros_like(mlp), zeros_like(mlp),
                               jnp.zeros((), jnp.int32)),
            stats=stats, active=jnp.arange(cap) < n,
            n_active=jnp.asarray(n, jnp.int32))

    # ------------------------------------------------------------------
    def visible_budget(self, cap: int):
        """Static compacted-decode row budget, or None when disabled."""
        f = self.config.visible_budget_factor
        if f <= 0.0 or f >= 1.0:
            return None
        return min(-(-int(cap * f) // 128) * 128, cap)

    def decode(self, anchors: AnchorParams, mlp: MLPParams, campos,
               cam_uid, visible_mask, active,
               level_scale_gate=None) -> NeuralGaussians:
        """generate_neural_gaussians (scaffold_scene.py:27-120).

        When visible_budget_factor is set, visible anchors are first
        rank-compacted to a static budget VB so the MLP heads run on
        ~the live visible set instead of the full capacity (the reference
        decodes only masked-compacted anchors; dense decode wastes the
        capacity headroom as MLP FLOPs).

        level_scale_gate: optional multiplier on decoded opacity used by
        Octree-GS progressive training (applied per anchor, full [CA]).
        """
        cfg = self.config
        K = cfg.n_offsets
        ca = anchors.anchor.shape[0]
        vb = self.visible_budget(ca)
        gate_full = visible_mask & active
        if vb is None:
            idx = valid = None
            vb_overflow = jnp.zeros((), bool)
            gate = gate_full
        else:
            rank = jnp.cumsum(gate_full.astype(jnp.int32)) - 1
            n_vis = rank[-1] + 1
            tgt = jnp.where(gate_full & (rank < vb), rank, vb)
            idx = jnp.zeros(vb + 1, jnp.int32).at[tgt].set(
                jnp.arange(ca, dtype=jnp.int32), mode="drop")[:vb]
            valid = jnp.arange(vb) < jnp.minimum(n_vis, vb)
            vb_overflow = n_vis > vb
            anchors = jax.tree.map(lambda a: a[idx], anchors)
            if level_scale_gate is not None:
                level_scale_gate = level_scale_gate[idx]
            gate = valid

        ob = anchors.anchor - campos
        dist = jnp.linalg.norm(ob, axis=-1, keepdims=True)
        view = ob / (dist + 1e-12)

        feat = anchors.feat
        if cfg.use_feat_bank:
            h = jnp.concatenate([view, dist], axis=-1)
            h = jax.nn.relu(h @ mlp.fb_w1 + mlp.fb_b1)
            bw = jax.nn.softmax(h @ mlp.fb_w2 + mlp.fb_b2, axis=-1)  # [CA,3]
            F = feat.shape[-1]
            f1 = jnp.repeat(feat[:, ::4], 4, axis=1)[:, :F]
            f2 = jnp.repeat(feat[:, ::2], 2, axis=1)[:, :F]
            feat = (f1 * bw[:, 0:1] + f2 * bw[:, 1:2] + feat * bw[:, 2:3])

        base = jnp.concatenate([feat, view], axis=-1)
        base_d = jnp.concatenate([feat, view, dist], axis=-1)

        h = base_d if cfg.add_opacity_dist else base
        h = jax.nn.relu(h @ mlp.op_w1 + mlp.op_b1)
        neural_op = jnp.tanh(h @ mlp.op_w2 + mlp.op_b2)       # [CA,K]
        if level_scale_gate is not None:
            neural_op = neural_op * level_scale_gate[:, None]

        h = base_d if cfg.add_cov_dist else base
        h = jax.nn.relu(h @ mlp.cov_w1 + mlp.cov_b1)
        scale_rot = (h @ mlp.cov_w2 + mlp.cov_b2).reshape(-1, K, 7)

        hc = base_d if cfg.add_color_dist else base
        if cfg.appearance_dim > 0:
            app = mlp.appearance[cam_uid]
            app = jnp.broadcast_to(app, (hc.shape[0],) + app.shape[-1:])
            hc = jnp.concatenate([hc, app], axis=-1)
        h = jax.nn.relu(hc @ mlp.col_w1 + mlp.col_b1)
        color = jax.nn.sigmoid(h @ mlp.col_w2 + mlp.col_b2).reshape(-1, K, 3)

        anchor_scaling = jnp.exp(anchors.scaling)             # [CA,6]
        g_scaling = (anchor_scaling[:, None, 3:6]
                     * jax.nn.sigmoid(scale_rot[..., :3]))    # [CA,K,3]
        rot_raw = scale_rot[..., 3:7]
        g_rot = rot_raw / (jnp.linalg.norm(rot_raw, axis=-1, keepdims=True)
                           + 1e-12)
        xyz = (anchors.anchor[:, None, :]
               + anchors.offset * anchor_scaling[:, None, :3])

        mask = gate[:, None] & (neural_op > 0.0)              # [VB,K]
        opac = jnp.where(mask, neural_op, 0.0)

        VBK = mask.shape[0] * K
        return NeuralGaussians(
            xyz=xyz.reshape(VBK, 3),
            color=color.reshape(VBK, 3),
            opacity=opac.reshape(VBK),
            scaling=g_scaling.reshape(VBK, 3),
            rotation=g_rot.reshape(VBK, 4),
            mask=mask.reshape(VBK),
            neural_opacity=neural_op.reshape(VBK),
            anchor_idx=idx, valid=valid, vb_overflow=vb_overflow)

    # ------------------------------------------------------------------
    def learning_rates(self, step):
        cfg = self.config
        s = self.spatial_lr_scale
        e = lambda i, f, m: expon_lr(step, i, f, lr_delay_mult=0.01,
                                     max_steps=m)
        anchor_lrs = AnchorParams(
            anchor=e(cfg.position_lr_init * s, cfg.position_lr_final * s,
                     cfg.position_lr_max_steps)
            if cfg.position_lr_init > 0 else jnp.asarray(0.0),
            offset=e(cfg.offset_lr_init * s, cfg.offset_lr_final * s,
                     cfg.offset_lr_max_steps),
            feat=jnp.asarray(cfg.feature_lr),
            scaling=jnp.asarray(cfg.scaling_lr),
            rotation=jnp.asarray(0.0),      # frozen in reference
            opacity=jnp.asarray(0.0),       # frozen in reference
        )
        mlp_op = e(cfg.mlp_opacity_lr_init, cfg.mlp_opacity_lr_final,
                   cfg.mlp_opacity_lr_max_steps)
        mlp_cov = e(cfg.mlp_cov_lr_init, cfg.mlp_cov_lr_final,
                    cfg.mlp_cov_lr_max_steps)
        mlp_col = e(cfg.mlp_color_lr_init, cfg.mlp_color_lr_final,
                    cfg.mlp_color_lr_max_steps)
        mlp_fb = e(cfg.mlp_featurebank_lr_init, cfg.mlp_featurebank_lr_final,
                   cfg.mlp_featurebank_lr_max_steps) \
            if cfg.use_feat_bank else jnp.asarray(0.0)
        app = e(cfg.appearance_lr_init, cfg.appearance_lr_final,
                cfg.appearance_lr_max_steps) \
            if cfg.appearance_dim > 0 else jnp.asarray(0.0)
        mlp_lrs = MLPParams(
            op_w1=mlp_op, op_b1=mlp_op, op_w2=mlp_op, op_b2=mlp_op,
            cov_w1=mlp_cov, cov_b1=mlp_cov, cov_w2=mlp_cov, cov_b2=mlp_cov,
            col_w1=mlp_col, col_b1=mlp_col, col_w2=mlp_col, col_b2=mlp_col,
            fb_w1=mlp_fb, fb_b1=mlp_fb, fb_w2=mlp_fb, fb_b2=mlp_fb,
            appearance=app)
        return anchor_lrs, mlp_lrs

    adam_step = staticmethod(VanillaGaussians.adam_step)
    ndc_grad_scale = staticmethod(VanillaGaussians.ndc_grad_scale)

    @staticmethod
    def dp_merge_stats(old, local, axis):
        """All ScaffoldStats fields are running sums; add per-device
        deltas across the camera-batch axis."""
        return jax.tree.map(
            lambda o, l: o + jax.lax.psum(l - o, axis), old, local)

    # ------------------------------------------------------------------
    def expand_stats_inputs(self, ng: NeuralGaussians, radii, mean2d_grad,
                            cap: int):
        """Scatter compacted [VB*K] decode outputs back to anchor-slot
        order [CA*K] for update_stats. Identity when compaction is off."""
        if ng.anchor_idx is None:
            return ng.neural_opacity, ng.mask, radii, mean2d_grad
        K = self.config.n_offsets
        vb = ng.anchor_idx.shape[0]
        tgt = jnp.where(ng.valid, ng.anchor_idx, cap)  # cap = dump row

        def back(a):
            a = a.reshape(vb, K, *a.shape[1:])
            out = jnp.zeros((cap + 1,) + a.shape[1:], a.dtype)
            out = out.at[tgt].set(a, mode="drop")
            return out[:cap].reshape((cap * K,) + a.shape[2:])

        return back(ng.neural_opacity), back(ng.mask), back(radii), \
            back(mean2d_grad)

    def update_stats(self, stats: ScaffoldStats, neural_opacity, mask,
                     radii, mean2d_grad, visible_mask, active, grad_scale):
        """training_statis (scaffold_gaussian.py:488-508).

        grad_scale: [2] NDC conversion (see VanillaGaussians.ndc_grad_scale).
        """
        K = self.config.n_offsets
        CA = stats.opacity_accum.shape[0]
        vis = visible_mask & active
        op = jnp.maximum(neural_opacity.reshape(CA, K), 0.0)
        opacity_accum = jnp.where(
            vis, stats.opacity_accum + jnp.sum(
                jnp.where(vis[:, None], op, 0.0), axis=1),
            stats.opacity_accum)
        anchor_denom = jnp.where(vis, stats.anchor_denom + 1.0,
                                 stats.anchor_denom)
        upd = (mask & (radii > 0)).reshape(CA, K)
        gnorm = jnp.linalg.norm(mean2d_grad[:, :2] * grad_scale,
                                axis=-1).reshape(CA, K)
        offset_grad_accum = jnp.where(upd, stats.offset_grad_accum + gnorm,
                                      stats.offset_grad_accum)
        offset_denom = jnp.where(upd, stats.offset_denom + 1.0,
                                 stats.offset_denom)
        return ScaffoldStats(opacity_accum, anchor_denom,
                             offset_grad_accum, offset_denom)

    # ------------------------------------------------------------------
    def _grow_level(self, state: ScaffoldState, level: int, grads,
                    offset_mask, key, voxel_size: float) -> ScaffoldState:
        """One level of anchor_growing (scaffold_gaussian.py:555-649)."""
        cfg = self.config
        an = state.anchors
        CA, K = an.offset.shape[0], an.offset.shape[1]
        cur_thr = cfg.densify_grad_threshold * (
            (cfg.update_hierachy_factor // 2) ** level)
        size_factor = cfg.update_init_factor // (
            cfg.update_hierachy_factor ** level)
        cur_size = voxel_size * size_factor

        rand = jax.random.uniform(key, (CA, K))
        cand = ((grads >= cur_thr) & offset_mask
                & (rand > 0.5 ** (level + 1))
                & state.active[:, None])

        anchor_scaling = jnp.exp(an.scaling[:, :3])
        all_xyz = an.anchor[:, None, :] + an.offset * anchor_scaling[:, None]
        cand_flat = cand.reshape(CA * K)
        xyz_flat = all_xyz.reshape(CA * K, 3)
        coords = jnp.round(xyz_flat / cur_size).astype(jnp.int32)
        keys = hash_coords(coords)

        exist_keys = jnp.where(
            state.active,
            hash_coords(jnp.round(an.anchor / cur_size).astype(jnp.int32)),
            KEY_MAX)
        exist_sorted = jnp.sort(exist_keys)

        dd = dedup_against(keys, cand_flat, exist_sorted)
        coords_sorted = coords[dd.order]
        feat_rep = jnp.repeat(an.feat, K, axis=0)             # [CA*K, F]
        feat_sorted = feat_rep[dd.order]
        feat_max = segment_max_sorted(feat_sorted, dd.seg_id, CA * K)
        new_feat_sorted = feat_max[dd.seg_id]                 # value per run

        # rank-scatter new anchors into free slots
        free = ~state.active
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        free_list = jnp.full((CA,), CA, jnp.int32).at[
            jnp.where(free, free_rank, CA)].set(
                jnp.arange(CA, dtype=jnp.int32), mode="drop")
        new_rank = jnp.cumsum(dd.is_new.astype(jnp.int32)) - 1
        dst = jnp.where(dd.is_new,
                        free_list[jnp.minimum(new_rank, CA - 1)], CA)
        dst = jnp.where(new_rank < jnp.sum(free.astype(jnp.int32)), dst, CA)

        new_anchor = coords_sorted.astype(jnp.float32) * cur_size
        log_size = jnp.log(jnp.asarray(cur_size, jnp.float32))
        newly = jnp.zeros(CA, bool).at[dst].set(True, mode="drop")

        # only anchor/feat carry per-candidate data; the rest are constants,
        # written with a mask to avoid [CA*K, ...]-sized scatter temporaries
        anchors = AnchorParams(
            anchor=an.anchor.at[dst].set(new_anchor, mode="drop"),
            offset=jnp.where(newly[:, None, None], 0.0, an.offset),
            feat=an.feat.at[dst].set(new_feat_sorted, mode="drop"),
            scaling=jnp.where(newly[:, None], log_size, an.scaling),
            rotation=jnp.where(newly[:, None],
                               jnp.array([1.0, 0, 0, 0], jnp.float32),
                               an.rotation),
            opacity=jnp.where(newly[:, None], float(np.log(0.1 / 0.9)),
                              an.opacity),
        )
        active = state.active | newly

        def zero_new(x):
            nd = newly.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(nd, jnp.zeros_like(x), x)

        adam_anchor = AdamState(
            m=jax.tree.map(zero_new, state.adam_anchor.m),
            v=jax.tree.map(zero_new, state.adam_anchor.v),
            count=state.adam_anchor.count)
        stats = ScaffoldStats(
            opacity_accum=zero_new(state.stats.opacity_accum),
            anchor_denom=zero_new(state.stats.anchor_denom),
            offset_grad_accum=zero_new(state.stats.offset_grad_accum),
            offset_denom=zero_new(state.stats.offset_denom))
        return state._replace(anchors=anchors, adam_anchor=adam_anchor,
                              stats=stats, active=active,
                              n_active=jnp.sum(active.astype(jnp.int32)))

    def adjust_anchor(self, state: ScaffoldState, key,
                      voxel_size: float) -> ScaffoldState:
        """Anchor growing + opacity-based pruning (adjust_anchor,
        scaffold_gaussian.py:651-705)."""
        cfg = self.config
        st = state.stats
        grads = st.offset_grad_accum / jnp.maximum(st.offset_denom, 1e-12)
        grads = jnp.nan_to_num(grads)
        offset_mask = st.offset_denom > (
            cfg.densification_interval * cfg.success_threshold * 0.5)

        keys = jax.random.split(key, cfg.update_depth)
        for lvl in range(cfg.update_depth):
            state = self._grow_level(state, lvl, grads, offset_mask,
                                     keys[lvl], voxel_size)

        # reset sampled-offset stats
        st = state.stats
        offset_denom = jnp.where(offset_mask, 0.0, st.offset_denom)
        offset_grad = jnp.where(offset_mask, 0.0, st.offset_grad_accum)

        # prune anchors with low accumulated opacity
        seen = st.anchor_denom > (cfg.densification_interval
                                  * cfg.success_threshold)
        prune = (st.opacity_accum < cfg.opacity_cull_threshold
                 * st.anchor_denom) & seen & state.active
        opacity_accum = jnp.where(seen, 0.0, st.opacity_accum)
        anchor_denom = jnp.where(seen, 0.0, st.anchor_denom)
        active = state.active & ~prune

        # reference clamps log-scaling cols 3:6 at 0.05 on prune pass
        sc = state.anchors.scaling
        sc = jnp.concatenate([sc[:, :3], jnp.minimum(sc[:, 3:], 0.05)],
                             axis=1)
        anchors = state.anchors._replace(scaling=sc)

        stats = ScaffoldStats(opacity_accum, anchor_denom, offset_grad,
                              offset_denom)
        return state._replace(anchors=anchors, stats=stats, active=active,
                              n_active=jnp.sum(active.astype(jnp.int32)))

    # ------------------------------------------------------------------
    def save_ply(self, state: ScaffoldState, path: str):
        """Scaffold PLY schema (scaffold_gaussian.py:388-458)."""
        from gssr_tpu.dataio.ply import write_ply
        act = np.asarray(state.active)
        an = jax.tree.map(lambda x: np.asarray(x)[act], state.anchors)
        n = an.anchor.shape[0]
        cols = {}
        for i, k in enumerate("xyz"):
            cols[k] = an.anchor[:, i]
        for k in ("nx", "ny", "nz"):
            cols[k] = np.zeros(n, np.float32)
        off = an.offset.transpose(0, 2, 1).reshape(n, -1)
        for i in range(off.shape[1]):
            cols[f"f_offset_{i}"] = off[:, i]
        for i in range(an.feat.shape[1]):
            cols[f"f_anchor_feat_{i}"] = an.feat[:, i]
        cols["opacity"] = an.opacity[:, 0]
        for i in range(6):
            cols[f"scale_{i}"] = an.scaling[:, i]
        for i in range(4):
            cols[f"rot_{i}"] = an.rotation[:, i]
        write_ply(path, {k: v.astype(np.float32) for k, v in cols.items()})

    def save_mlp_checkpoints(self, state: ScaffoldState, path: str):
        leaves = {f"mlp_{f}": np.asarray(getattr(state.mlp, f))
                  for f in MLPParams._fields}
        np.savez(path, **leaves)
        # GS-SR interop: also write the reference's unite-mode
        # checkpoints.pth next to the npz so the CUDA ecosystem's
        # load_mlp_checkpoints can consume models trained here
        # (scaffold_gaussian.py:768-789); skipped when torch is absent.
        try:
            from gssr_tpu.models.interop import save_gs_sr_mlp_checkpoint
            save_gs_sr_mlp_checkpoint(
                os.path.dirname(os.path.abspath(path)), state.mlp,
                use_feat_bank=self.config.use_feat_bank)
        except ImportError:
            global _WARNED_NO_TORCH
            if not _WARNED_NO_TORCH:
                _WARNED_NO_TORCH = True
                print("[scaffold] torch unavailable: skipping the GS-SR "
                      "interop checkpoints.pth export (npz was written)")

    def load_mlp_checkpoints(self, state: ScaffoldState, path: str):
        data = np.load(path)
        mlp = MLPParams(**{f: jnp.asarray(data[f"mlp_{f}"])
                           for f in MLPParams._fields})
        return state._replace(mlp=mlp)

    def load_ply(self, path: str, capacity: Optional[int] = None,
                 seed: int = 0) -> ScaffoldState:
        from gssr_tpu.dataio.ply import read_ply
        cfg = self.config
        cols = read_ply(path)
        n = len(cols["x"])
        K, F = cfg.n_offsets, cfg.feat_dim
        cap = capacity or cfg.capacity or -(-int(
            n * cfg.capacity_multiplier) // 128) * 128
        anchor = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        noff = 3 * K
        off = np.stack([cols[f"f_offset_{i}"] for i in range(noff)], axis=1)
        off = off.reshape(n, 3, K).transpose(0, 2, 1)
        feat = np.stack([cols[f"f_anchor_feat_{i}"] for i in range(F)], axis=1)
        scaling = np.stack([cols[f"scale_{i}"] for i in range(6)], axis=1)
        rot = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)
        opacity = cols["opacity"][:, None]

        def alloc(a, fill=0.0):
            out = np.full((cap,) + a.shape[1:], fill, np.float32)
            out[:n] = a
            return jnp.asarray(out)

        # explicit class call: octree subclass's create_from_points needs
        # cameras, but PLY loading rebuilds the base state directly
        base = ScaffoldGaussians.create_from_points(self, anchor,
                                                    capacity=cap, seed=seed)
        anchors = AnchorParams(
            anchor=alloc(anchor), offset=alloc(off), feat=alloc(feat),
            scaling=alloc(scaling, fill=-10.0), rotation=alloc(rot, fill=1.0),
            opacity=alloc(opacity, fill=-10.0))
        return base._replace(
            anchors=anchors, active=jnp.arange(cap) < n,
            n_active=jnp.asarray(n, jnp.int32))
