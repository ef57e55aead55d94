#!/usr/bin/env python
"""Sub-stage decomposition of binning + backward ablations (TPU).

Pipelined scalar-sync timing (see profile_pipeline.timeit): each candidate
is a jitted scalar function, timed over N dispatches with one 4-byte fetch.

Stages:
  expand        instance expansion -> (key, g_c) sort inputs
  sort          lax.sort of (key, g_c) alone
  postsort      searchsorted + chunk-align move (gather formulation)
  bwd ablations full step vs: no-scatter pack VJP, stop_grad preprocess
"""
from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from profile_pipeline import _scalarize, timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=2_490_368)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops import sh as sh_ops
    from gssr_tpu.ops import binning as B
    from gssr_tpu.ops.blend_pallas import CHUNK, _blend_core, gather_rows
    from gssr_tpu.ops.projection import TILE, preprocess
    from gssr_tpu.ops.rasterize import rasterize

    W, H, N, CAP = 1600, 1056, args.n, args.cap
    rng = np.random.default_rng(0)
    cam = Camera(uid=0, colmap_id=0, image_name="bench",
                 R=np.eye(3), T=np.array([0.0, 0.0, 4.0]),
                 fovx=math.radians(70), fovy=math.radians(50),
                 width=W, height=H)
    means = jnp.asarray(
        rng.uniform(-3, 3, (N, 3)) * np.array([1.5, 1.0, 1.0]), jnp.float32)
    scales = jnp.asarray(np.exp(rng.uniform(-4.5, -2.5, (N, 3))), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (N, 16, 3)), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    camarr = cam.arrays()
    tiles_x, tiles_y = W // TILE, H // TILE
    num_tiles = tiles_x * tiles_y

    p = jax.jit(lambda *a: preprocess(*a[:3], camarr, W, H, opacity=a[3]))(
        means, scales, rots, opac)
    rect, depth, tiles, tmask = (jax.block_until_ready(x) for x in
                                 (p.rect, p.depth, p.tiles_touched,
                                  p.tile_mask))

    res = {}

    # ---- expand: everything before the sort -----------------------------
    num_tiles_ = num_tiles
    tile_bits = max(1, int(num_tiles_ + 1).bit_length())
    depth_bits = 32 - tile_bits

    def expand(rect, depth, tiles_touched, tile_mask):
        key, payload, num_rendered, ii = B._expand_keys(
            rect, depth, tiles_touched, tile_mask, tiles_x, num_tiles_,
            CAP, depth_bits)
        return key, payload

    res["expand"] = timeit(jax.jit(_scalarize(expand)),
                           rect, depth, tiles, tmask, iters=args.iters)
    key, payload = jax.block_until_ready(
        jax.jit(expand)(rect, depth, tiles, tmask))

    # ---- rect-cover histogram (MXU matmul) -------------------------------
    def hist(rect, tiles_touched):
        return B.tile_cover_counts(rect, tiles_touched > 0, tiles_x, tiles_y)
    res["histogram"] = timeit(jax.jit(_scalarize(hist)), rect, tiles,
                              iters=args.iters)

    # ---- sort alone ------------------------------------------------------
    def sort_only(key, payload):
        return jax.lax.sort((key, payload), num_keys=1)
    res["sort"] = timeit(jax.jit(_scalarize(sort_only)), key, payload,
                         iters=args.iters)

    # ---- backward ablations ---------------------------------------------
    def step(stop_pre: bool, no_scatter: bool):
        def loss_fn(means, scales, rots, opac, sh):
            import gssr_tpu.ops.blend_pallas as BP
            pw, ph = W, H
            proj = preprocess(means, scales, rots, camarr, pw, ph,
                              opacity=opac)
            color = sh_ops.sh_to_color(3, sh, means, camarr.campos)
            if stop_pre:
                proj = jax.tree.map(jax.lax.stop_gradient, proj)
                color = jax.lax.stop_gradient(color)
            binning = B.bin_gaussians(
                jax.lax.stop_gradient(proj.rect),
                jax.lax.stop_gradient(proj.depth),
                jax.lax.stop_gradient(proj.tiles_touched),
                tiles_x, tiles_y, CAP, chunk=CHUNK,
                tile_mask=proj.tile_mask)
            per_gauss = jnp.concatenate(
                [proj.mean2d, proj.conic, opac[:, None], color], axis=1)
            if no_scatter:
                gathered = jax.lax.stop_gradient(per_gauss)[binning.gauss_id] \
                    + 0.0 * per_gauss[0, 0]
            else:
                gathered = gather_rows(per_gauss, binning.gauss_id, 9)
            attrs = (gathered * binning.hit[:, None]).T
            acc, fT = _blend_core(attrs, binning.tile_ranges,
                                  binning.chunk_map, binning.n_live_chunks,
                                  tiles_x, tiles_y)
            img = acc + fT[..., None] * bg
            return jnp.mean(jnp.abs(img - tgt))
        def f(*a):
            v, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*a)
            return sum(jnp.sum(x) * 1e-9 for x in jax.tree.leaves(g)) + v
        return f

    res["step full"] = timeit(jax.jit(step(False, False)),
                              means, scales, rots, opac, sh,
                              iters=args.iters)
    res["step no-scatter"] = timeit(jax.jit(step(False, True)),
                                    means, scales, rots, opac, sh,
                                    iters=args.iters)
    res["step stop-pre"] = timeit(jax.jit(step(True, False)),
                                  means, scales, rots, opac, sh,
                                  iters=args.iters)

    print(f"\n{'stage':<22} {'ms':>9}")
    for k, v in res.items():
        print(f"{k:<22} {v:9.2f}")
    print(f"\nscatter cost ~= {res['step full'] - res['step no-scatter']:.1f}"
          f" ms; preprocess-AD cost ~= "
          f"{res['step full'] - res['step stop-pre']:.1f} ms (incl scatter)")


if __name__ == "__main__":
    main()
