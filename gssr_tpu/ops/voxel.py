"""Voxel-grid helpers for anchor-based models (Scaffold-GS / Octree-GS).

Static-shape replacements for the reference's torch.unique / scatter_max
anchor growing (scaffold_gaussian.py:555-649): voxel coordinates are hashed
to int32 keys and deduplicated with a sort — a hash collision (~2^-31 per
pair) at worst suppresses one candidate anchor, which densification
tolerates by design.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_H1, _H2, _H3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D
KEY_MAX = np.int32(np.iinfo(np.int32).max)


def hash_coords(coords):
    """[N,3] int32 voxel coords -> [N] int32 keys (never KEY_MAX)."""
    c = coords.astype(jnp.uint32)
    h = (c[..., 0] * np.uint32(_H1)) ^ (c[..., 1] * np.uint32(_H2)) \
        ^ (c[..., 2] * np.uint32(_H3))
    h = h ^ (h >> 15)
    key = (h & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
    return jnp.minimum(key, KEY_MAX - 1)


class VoxelDedup(NamedTuple):
    order: jnp.ndarray        # [N] argsort of keys (invalid keys last)
    sorted_keys: jnp.ndarray  # [N]
    is_new: jnp.ndarray       # [N] in sorted order: first occurrence, valid,
                              #     and not present in `existing_keys`
    seg_id: jnp.ndarray       # [N] run id per sorted element


def dedup_against(cand_keys, cand_valid, existing_sorted_keys) -> VoxelDedup:
    """Deduplicate candidate voxel keys and drop ones already existing.

    existing_sorted_keys must be sorted ascending (invalid slots = KEY_MAX).
    """
    n = cand_keys.shape[0]
    keys = jnp.where(cand_valid, cand_keys, KEY_MAX)
    sorted_keys, order = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
    first = sorted_keys != prev
    pos = jnp.searchsorted(existing_sorted_keys, sorted_keys)
    pos_c = jnp.minimum(pos, existing_sorted_keys.shape[0] - 1)
    exists = existing_sorted_keys[pos_c] == sorted_keys
    is_new = first & (~exists) & (sorted_keys != KEY_MAX)
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    return VoxelDedup(order=order, sorted_keys=sorted_keys, is_new=is_new,
                      seg_id=seg_id)


def segment_max_sorted(values_sorted, seg_id, num_segments):
    """Per-run max of values already sorted by key. values: [N, F]."""
    return jax.ops.segment_max(values_sorted, seg_id,
                               num_segments=num_segments,
                               indices_are_sorted=True)


def voxelize_points_host(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Host-side point voxelization for init (scaffold voxelize_sample)."""
    coords = np.unique(np.round(points / voxel_size), axis=0)
    return coords * voxel_size
