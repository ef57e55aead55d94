"""K-nearest-neighbor distances for gaussian scale initialization.

Replaces the reference's simple-knn CUDA extension (`distCUDA2`,
submodules/simple-knn/spatial.cu:15-26): mean squared distance to the 3
nearest neighbors per point.

Two implementations:
* `mean_knn_dist2_host`: scipy cKDTree — used at scene-init time (host-side
  anyway, exact, fast for millions of points).
* `mean_knn_dist2_jax`: tiled brute-force top-k in jnp for on-device use;
  O(N^2 / tile) but vectorizes onto the VPU/MXU; fine for the point counts
  where it is needed inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_knn_dist2_host(points: np.ndarray, k: int = 3) -> np.ndarray:
    if k == 3:
        # native C++ Morton-box path (the simple-knn parity implementation)
        from gssr_tpu.ops.knn_native import mean_knn_dist2_native
        out = mean_knn_dist2_native(points)
        if out is not None:
            return out.astype(np.float64)
    from scipy.spatial import cKDTree
    tree = cKDTree(np.asarray(points, dtype=np.float64))
    d, _ = tree.query(points, k=k + 1)   # first neighbor is the point itself
    return np.mean(d[:, 1:] ** 2, axis=1)


def mean_knn_dist2_jax(points, k: int = 3, tile: int = 1024):
    """[N,3] -> [N] mean of squared distances to k nearest neighbors."""
    n = points.shape[0]
    pad = (-n) % tile
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    npad = n + pad
    sq = jnp.sum(pts * pts, axis=-1)

    def row_block(i):
        block = jax.lax.dynamic_slice(pts, (i * tile, 0), (tile, 3))
        bsq = jax.lax.dynamic_slice(sq, (i * tile,), (tile,))
        d2 = (bsq[:, None] - 2.0 * block @ pts.T + sq[None, :])
        # mask self-distances and padding
        cols = jnp.arange(npad)
        rows = i * tile + jnp.arange(tile)
        d2 = jnp.where(cols[None, :] == rows[:, None], jnp.inf, d2)
        d2 = jnp.where(jnp.isfinite(sq)[None, :], d2, jnp.inf)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.maximum(-neg_top, 0.0), axis=1)

    out = jax.lax.map(row_block, jnp.arange(npad // tile))
    return out.reshape(npad)[:n]
