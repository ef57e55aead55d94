"""Octree-GS: LOD anchors on top of Scaffold-GS.

Parity: /root/reference/gssr/gaussian/octree_gaussian.py — per-anchor
integer levels from a camera-distance octree, LOD anchor masks
(set_anchor_mask, :255-274), visibility weed-out (:203-214), per-level
anchor growing including the next-finer level (:401-534), progressive
coarse-to-fine schedule, and the level/extra_level/info PLY schema.

TPU re-design: init (octree sampling, weed-out) is host-side numpy; the
per-camera LOD mask and progressive gate are pure jnp inside the jitted
train step; growing levels run as a static python loop of masked
hash-dedup scatters like Scaffold.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gssr_tpu.models.scaffold import (
    AnchorParams,
    ScaffoldGaussianConfig,
    ScaffoldGaussians,
    ScaffoldState,
    ScaffoldStats,
)
from gssr_tpu.models.vanilla import AdamState
from gssr_tpu.ops.knn import mean_knn_dist2_host
from gssr_tpu.ops.voxel import (
    KEY_MAX,
    dedup_against,
    hash_coords,
    segment_max_sorted,
)


@dataclasses.dataclass(frozen=True)
class OctreeGaussianConfig(ScaffoldGaussianConfig):
    fork: int = 2
    add_level: bool = False
    visible_threshold: float = -1.0
    dist2level: str = "round"
    base_layer: int = -1
    progressive: bool = False
    extend: float = 1.1
    dist_ratio: float = 0.999
    levels: int = -1
    init_level: int = -1
    update_anchor: bool = True
    update_ratio: float = 0.2
    extra_ratio: float = 0.25
    extra_up: float = 0.01
    appearance_dim: int = 0     # octree-gs preset disables appearance


class OctreeState(NamedTuple):
    """Structural superset of ScaffoldState (same leading field names), so
    the ScaffoldScene jitted step operates on it unchanged."""
    anchors: AnchorParams
    mlp: object
    adam_anchor: AdamState
    adam_mlp: AdamState
    stats: ScaffoldStats
    active: jnp.ndarray
    n_active: jnp.ndarray
    level: jnp.ndarray        # [CA] int32
    extra_level: jnp.ndarray  # [CA] float32


class OctreeGaussians(ScaffoldGaussians):
    config: OctreeGaussianConfig

    def __init__(self, config: OctreeGaussianConfig,
                 spatial_lr_scale: float = 1.0, num_cameras: int = 1):
        super().__init__(config, spatial_lr_scale, num_cameras)
        self.fork = config.fork
        self.levels = config.levels
        self.init_level = config.init_level
        self.standard_dist = 1.0
        self.init_pos = np.zeros(3, np.float32)
        self.visible_threshold = config.visible_threshold
        self.cam_infos = np.zeros((0, 4), np.float32)
        self.coarse_intervals: list = []

    # ------------------------------------------------------------------
    def set_level(self, points: np.ndarray, cameras):
        """Level count from camera-distance quantiles (octree_gaussian
        set_level, :152-172). cameras: list of host Camera objects."""
        cfg = self.config
        all_dist = []
        cam_infos = []
        for cam in cameras:
            c = np.asarray(cam.campos, np.float64)
            cam_infos.append([c[0], c[1], c[2], 1.0])
            d = np.linalg.norm(points - c, axis=1)
            all_dist += [np.quantile(d, cfg.dist_ratio),
                         np.quantile(d, 1 - cfg.dist_ratio)]
        self.cam_infos = np.asarray(cam_infos, np.float32)
        all_dist = np.asarray(all_dist)
        dist_max = np.quantile(all_dist, cfg.dist_ratio)
        dist_min = np.quantile(all_dist, 1 - cfg.dist_ratio)
        self.standard_dist = float(dist_max)
        if self.levels == -1:
            self.levels = int(round(
                math.log2(dist_max / dist_min) / math.log2(self.fork))) + 1
        if self.init_level == -1:
            self.init_level = self.levels // 2

    def set_coarse_interval(self, coarse_iter: int, coarse_factor: float):
        self.coarse_intervals = []
        num_level = self.levels - 1 - self.init_level
        if num_level > 0:
            q = 1.0 / coarse_factor
            if abs(1.0 - q) < 1e-9:         # uniform spacing limit
                a1 = coarse_iter / num_level
            else:
                a1 = coarse_iter * (1 - q) / (1 - q ** num_level)
            acc = 0.0
            for i in range(num_level):
                acc += a1 * q ** i
                self.coarse_intervals.append(acc)

    def _pred_level_np(self, positions: np.ndarray, cam: np.ndarray):
        d = np.linalg.norm(positions - cam[:3], axis=1) * cam[3]
        return np.log2(self.standard_dist / np.maximum(d, 1e-9)) \
            / math.log2(self.fork)

    def _map_to_int_level_np(self, pred, cur_level: int):
        mode = self.config.dist2level
        if mode == "floor":
            lv = np.floor(pred)
        elif mode == "round":
            lv = np.round(pred)
        elif mode == "ceil":
            lv = np.ceil(pred)
        elif mode == "progressive":
            lv = np.floor(np.clip(pred + 1.0, 0.9999, cur_level + 0.9999))
        else:
            raise ValueError(mode)
        return np.clip(lv, 0, cur_level).astype(np.int32)

    def weed_out_np(self, positions: np.ndarray, levels: np.ndarray):
        """Visibility-ratio filter over training cameras (:203-214)."""
        count = np.zeros(len(positions))
        for cam in self.cam_infos:
            int_level = self._map_to_int_level_np(
                self._pred_level_np(positions, cam), self.levels - 1)
            count += (levels <= int_level)
        ratio = count / max(len(self.cam_infos), 1)
        mask = ratio > self.visible_threshold
        return positions[mask], levels[mask], float(ratio.mean())

    # ------------------------------------------------------------------
    def create_from_points(self, points: np.ndarray, cameras=None,
                           capacity: Optional[int] = None,
                           seed: int = 0) -> OctreeState:
        cfg = self.config
        points = np.asarray(points, np.float64)[::cfg.sampling_ratio]
        assert cameras is not None, "octree init needs cameras for LOD"
        self.set_level(points, cameras)

        box_min = float(points.min()) * cfg.extend
        box_max = float(points.max()) * cfg.extend
        box_d = box_max - box_min
        base_layer = cfg.base_layer
        if base_layer < 0:
            base_layer = int(round(math.log2(box_d / 0.02))) \
                - (self.levels // 2) + 1
        self.voxel_size = box_d / (float(self.fork) ** base_layer)
        self.init_pos = np.full(3, box_min, np.float32)

        # octree sampling: per-level voxel dedup of the SfM points
        positions, levels = [], []
        for lv in range(self.levels):
            sz = self.voxel_size / (float(self.fork) ** lv)
            coords = np.unique(np.round((points - self.init_pos) / sz),
                               axis=0)
            positions.append(coords * sz + self.init_pos)
            levels.append(np.full(len(coords), lv, np.int32))
        positions = np.concatenate(positions)
        levels = np.concatenate(levels)

        if self.visible_threshold < 0:
            self.visible_threshold = 0.0
            positions, levels, self.visible_threshold = self.weed_out_np(
                positions, levels)
        positions, levels, _ = self.weed_out_np(positions, levels)

        n = len(positions)
        cap = capacity or cfg.capacity or int(
            max(n * cfg.capacity_multiplier, 1 << 12))
        cap = -(-cap // 128) * 128

        base = super(OctreeGaussians, self).create_from_points(
            positions, capacity=cap, seed=seed)
        # super() voxelizes again at self.voxel_size — rebuild anchors with
        # the octree positions directly instead
        K, F = cfg.n_offsets, cfg.feat_dim
        dist2 = np.maximum(mean_knn_dist2_host(positions), 1e-7)
        scales = np.log(np.sqrt(dist2))[:, None].repeat(6, axis=1)

        def alloc(arr, shape, fill=0.0):
            out = np.full((cap,) + shape, fill, np.float32)
            out[:n] = arr
            return jnp.asarray(out)

        anchors = AnchorParams(
            anchor=alloc(positions, (3,)),
            offset=jnp.zeros((cap, K, 3), jnp.float32),
            feat=jnp.zeros((cap, F), jnp.float32),
            scaling=alloc(scales, (6,), fill=-10.0),
            rotation=alloc(np.tile([1.0, 0, 0, 0], (n, 1)), (4,), fill=1.0),
            opacity=jnp.full((cap, 1), float(np.log(0.1 / 0.9)), jnp.float32),
        )
        zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)
        base = base._replace(
            anchors=anchors,
            adam_anchor=AdamState(zeros_like(anchors), zeros_like(anchors),
                                  jnp.zeros((), jnp.int32)),
            active=jnp.arange(cap) < n,
            n_active=jnp.asarray(n, jnp.int32))
        lv = np.zeros(cap, np.int32)
        lv[:n] = levels
        return OctreeState(*base, level=jnp.asarray(lv),
                           extra_level=jnp.zeros(cap, jnp.float32))

    # ------------------------------------------------------------------
    def pred_int_level(self, state: "OctreeState", campos, step,
                       is_training: bool):
        """set_anchor_mask (:255-274): per-anchor LOD gate for one camera.

        Returns (anchor_mask, opacity_gate or None)."""
        cfg = self.config
        level_f = state.level.astype(jnp.float32)
        anchor_pos = state.anchors.anchor + (self.voxel_size / 2.0) / (
            float(self.fork) ** level_f)[:, None]
        dist = jnp.linalg.norm(anchor_pos - campos, axis=-1)
        pred = jnp.log2(self.standard_dist / jnp.maximum(dist, 1e-9)) \
            / math.log2(self.fork) + state.extra_level

        if cfg.progressive and is_training and self.coarse_intervals:
            coarse_index = jnp.searchsorted(
                jnp.asarray(self.coarse_intervals, jnp.float32),
                step) + 1 + self.init_level
        else:
            coarse_index = self.levels
        cur_level = coarse_index - 1

        gate = None
        mode = cfg.dist2level
        if mode == "floor":
            int_level = jnp.clip(jnp.floor(pred), 0, cur_level)
        elif mode == "round":
            int_level = jnp.clip(jnp.round(pred), 0, cur_level)
        elif mode == "ceil":
            int_level = jnp.clip(jnp.ceil(pred), 0, cur_level)
        elif mode == "progressive":
            cl = jnp.asarray(cur_level, jnp.float32)
            p = jnp.clip(pred + 1.0, 0.9999, cl + 0.9999)
            int_level = jnp.floor(p)
            frac = p - int_level
            transition = level_f == int_level
            gate = jnp.where(transition, frac, 1.0)
        else:
            raise ValueError(mode)
        mask = level_f <= int_level
        return mask, gate

    # ------------------------------------------------------------------
    def _weed_out_jax(self, positions, levels_f):
        """Vectorized weed_out for candidate anchors inside densify."""
        cams = jnp.asarray(self.cam_infos)                    # [M,4]
        d = jnp.linalg.norm(positions[:, None, :] - cams[None, :, :3],
                            axis=-1) * cams[None, :, 3]
        pred = jnp.log2(self.standard_dist / jnp.maximum(d, 1e-9)) \
            / math.log2(self.fork)
        int_level = jnp.clip(jnp.round(pred), 0, self.levels - 1)
        count = jnp.mean((levels_f[:, None] <= int_level)
                         .astype(jnp.float32), axis=1)
        return count > self.visible_threshold

    def _grow_octree_set(self, state: OctreeState, cand_flat, new_level: int,
                         cur_size: float, with_feat: bool) -> OctreeState:
        """Insert deduped candidates as new anchors at `new_level`."""
        base = state
        an = base.anchors
        CA, K = an.offset.shape[0], an.offset.shape[1]

        anchor_scaling = jnp.exp(an.scaling[:, :3])
        all_xyz = an.anchor[:, None, :] + an.offset * anchor_scaling[:, None]
        xyz_flat = all_xyz.reshape(CA * K, 3)
        init_pos = jnp.asarray(self.init_pos)
        coords = jnp.round((xyz_flat - init_pos) / cur_size).astype(jnp.int32)
        keys = hash_coords(coords)

        level_match = state.level == new_level
        exist_keys = jnp.where(
            base.active & level_match,
            hash_coords(jnp.round((an.anchor - init_pos) / cur_size)
                        .astype(jnp.int32)),
            KEY_MAX)
        exist_sorted = jnp.sort(exist_keys)

        dd = dedup_against(keys, cand_flat, exist_sorted)
        coords_sorted = coords[dd.order]
        new_anchor = coords_sorted.astype(jnp.float32) * cur_size + init_pos
        weed = self._weed_out_jax(
            new_anchor, jnp.full(CA * K, float(new_level), jnp.float32))
        is_new = dd.is_new & weed

        if with_feat:
            feat_rep = jnp.repeat(an.feat, K, axis=0)
            feat_sorted = feat_rep[dd.order]
            feat_max = segment_max_sorted(feat_sorted, dd.seg_id, CA * K)
            new_feat = feat_max[dd.seg_id]
        else:
            new_feat = jnp.zeros((CA * K, an.feat.shape[1]), jnp.float32)

        free = ~base.active
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        free_list = jnp.full((CA,), CA, jnp.int32).at[
            jnp.where(free, free_rank, CA)].set(
                jnp.arange(CA, dtype=jnp.int32), mode="drop")
        new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        dst = jnp.where(is_new, free_list[jnp.minimum(new_rank, CA - 1)], CA)
        newly = jnp.zeros(CA, bool).at[dst].set(True, mode="drop")

        log_size = jnp.log(jnp.asarray(cur_size, jnp.float32))
        anchors = AnchorParams(
            anchor=an.anchor.at[dst].set(new_anchor, mode="drop"),
            offset=jnp.where(newly[:, None, None], 0.0, an.offset),
            feat=an.feat.at[dst].set(new_feat, mode="drop"),
            scaling=jnp.where(newly[:, None], log_size, an.scaling),
            rotation=jnp.where(newly[:, None],
                               jnp.array([1.0, 0, 0, 0], jnp.float32),
                               an.rotation),
            opacity=jnp.where(newly[:, None], float(np.log(0.1 / 0.9)),
                              an.opacity))
        active = base.active | newly

        def zero_new(x):
            nd = newly.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(nd, jnp.zeros_like(x), x)

        adam = AdamState(m=jax.tree.map(zero_new, base.adam_anchor.m),
                         v=jax.tree.map(zero_new, base.adam_anchor.v),
                         count=base.adam_anchor.count)
        stats = ScaffoldStats(
            opacity_accum=zero_new(base.stats.opacity_accum),
            anchor_denom=zero_new(base.stats.anchor_denom),
            offset_grad_accum=zero_new(base.stats.offset_grad_accum),
            offset_denom=zero_new(base.stats.offset_denom))
        level_arr = jnp.where(newly, new_level, state.level)
        extra_arr = jnp.where(newly, 0.0, state.extra_level)
        return state._replace(
            anchors=anchors, adam_anchor=adam, stats=stats, active=active,
            n_active=jnp.sum(active.astype(jnp.int32)),
            level=level_arr, extra_level=extra_arr)

    def adjust_anchor_octree(self, state: OctreeState, key,
                             step) -> OctreeState:
        """Per-level growing + pruning (octree_gaussian adjust_anchor)."""
        cfg = self.config
        base = state
        st = base.stats
        CA, K = base.anchors.offset.shape[0], cfg.n_offsets
        grads = st.offset_grad_accum / jnp.maximum(st.offset_denom, 1e-12)
        grads = jnp.nan_to_num(grads)
        offset_mask = st.offset_denom > (
            cfg.densification_interval * cfg.success_threshold * 0.5)
        grads = jnp.where(offset_mask, grads, 0.0)
        anchor_grads = jnp.sum(grads, axis=1) / (
            jnp.sum(offset_mask.astype(jnp.float32), axis=1) + 1e-6)

        update_value = float(self.fork) ** cfg.update_ratio
        # progressive training delays extra-level bumps and next-finer-level
        # growth until the coarse schedule has finished
        if cfg.progressive and self.coarse_intervals:
            past_coarse = step > self.coarse_intervals[-1]
        else:
            past_coarse = jnp.asarray(True)

        extra_level = state.extra_level
        for lv in range(self.levels):
            cur_size = self.voxel_size / (float(self.fork) ** lv)
            ds_size = cur_size / self.fork
            cur_thr = cfg.densify_grad_threshold * (update_value ** lv)
            ds_thr = cur_thr * update_value
            extra_thr = cur_thr * cfg.extra_ratio
            level_mask = state.level == lv

            cand = ((grads >= cur_thr) & (grads < ds_thr)
                    & level_mask[:, None] & base.active[:, None])
            cand_ds = ((grads >= ds_thr)
                       & level_mask[:, None] & base.active[:, None]
                       & past_coarse)
            bump = (anchor_grads >= extra_thr) & base.active & past_coarse
            extra_level = extra_level + cfg.extra_up * bump.astype(
                jnp.float32)
            state = state._replace(extra_level=extra_level)
            state = self._grow_octree_set(
                state, cand.reshape(CA * K), lv, cur_size, with_feat=True)
            if lv < self.levels - 1:
                state = self._grow_octree_set(
                    state, cand_ds.reshape(CA * K), lv + 1, ds_size,
                    with_feat=False)
            base = state
            extra_level = state.extra_level

        # stats resets + opacity prune (same as scaffold)
        st = base.stats
        offset_denom = jnp.where(offset_mask, 0.0, st.offset_denom)
        offset_grad = jnp.where(offset_mask, 0.0, st.offset_grad_accum)
        seen = st.anchor_denom > (cfg.densification_interval
                                  * cfg.success_threshold)
        prune = (st.opacity_accum < cfg.opacity_cull_threshold
                 * st.anchor_denom) & seen & base.active
        opacity_accum = jnp.where(seen, 0.0, st.opacity_accum)
        anchor_denom = jnp.where(seen, 0.0, st.anchor_denom)
        active = base.active & ~prune
        sc = base.anchors.scaling
        sc = jnp.concatenate([sc[:, :3], jnp.minimum(sc[:, 3:], 0.05)],
                             axis=1)
        anchors = base.anchors._replace(scaling=sc)
        stats = ScaffoldStats(opacity_accum, anchor_denom, offset_grad,
                              offset_denom)
        return state._replace(anchors=anchors, stats=stats, active=active,
                              n_active=jnp.sum(active.astype(jnp.int32)),
                              extra_level=extra_level)

    # ------------------------------------------------------------------
    def save_ply(self, state: OctreeState, path: str):
        """Octree PLY schema with level/extra_level/info columns
        (octree_gaussian.py:276-310)."""
        from gssr_tpu.dataio.ply import write_ply
        act = np.asarray(state.active)
        an = jax.tree.map(lambda x: np.asarray(x)[act], state.anchors)
        level = np.asarray(state.level)[act].astype(np.float32)
        extra = np.asarray(state.extra_level)[act]
        n = an.anchor.shape[0]
        info = np.zeros(n, np.float32)
        if n > 0:
            info[0] = self.voxel_size
        if n > 1:
            info[1] = self.standard_dist
        cols = {}
        for i, k in enumerate("xyz"):
            cols[k] = an.anchor[:, i]
        for k in ("nx", "ny", "nz"):
            cols[k] = np.zeros(n, np.float32)
        cols["level"] = level
        cols["extra_level"] = extra
        cols["info"] = info
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

    def load_ply(self, path: str, capacity=None, seed: int = 0):
        """Load the octree PLY schema; restores levels and the voxel/dist
        metadata smuggled in the info column."""
        from gssr_tpu.dataio.ply import read_ply
        cols = read_ply(path)
        n = len(cols["x"])
        if n > 0:
            self.voxel_size = float(cols["info"][0])
        if n > 1:
            self.standard_dist = float(cols["info"][1])
        levels_np = cols["level"].astype(np.int32)
        if self.levels <= 0:
            self.levels = int(levels_np.max()) + 1 if n else 1
        base = ScaffoldGaussians.load_ply(self, path, capacity=capacity,
                                          seed=seed)
        cap = base.anchors.anchor.shape[0]
        lv = np.zeros(cap, np.int32)
        lv[:n] = levels_np
        ex = np.zeros(cap, np.float32)
        ex[:n] = cols["extra_level"]
        return OctreeState(*base, level=jnp.asarray(lv),
                           extra_level=jnp.asarray(ex))
