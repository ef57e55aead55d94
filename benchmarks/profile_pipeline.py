#!/usr/bin/env python
"""Stage-by-stage timing of the rasterize fwd+bwd pipeline on-device.

Times each pipeline stage in isolation on the bench.py workload so perf
work targets the actual top cost (VERDICT round-1 decomposition was
scatter-add / binning / kernels — this keeps that decomposition honest
as optimizations land):

  preprocess          projection + cov2D + SH (N-sized, XLA)
  binning             expand -> fused-key sort -> chunked ranges (I-sized)
  pack fwd            per-instance attr gather [N,A] -> [A,I]
  blend fwd           Pallas forward kernel
  blend fwd+bwd       custom-VJP pair (cotangent = ones)
  pack bwd (scatter)  gather_rows VJP: scatter-add I rows -> N
  full fwd            rasterize()
  full fwd+bwd        value_and_grad of L1 loss (the bench.py step)

Usage: python benchmarks/profile_pipeline.py [--n 200000] [--cap 2490368]
"""
from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *args, iters=10, warmup=2):
    """Pipelined timing: fn must return a SCALAR (device). We enqueue
    `iters` dispatches back-to-back and sync once with a 4-byte fetch, so
    axon-tunnel dispatch latency and array transfer cost are amortized out
    (fetching any real array through the tunnel runs at <1 MB/s and
    swamps the measurement)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _scalarize(fn):
    """Wrap fn so it returns one f32 scalar derived from all outputs."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                           else x) * 1e-9
                   for x in jax.tree.leaves(out))
    return wrapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cap", type=int, default=2_490_368)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1056)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gssr_tpu.cameras import Camera
    from gssr_tpu.ops import sh as sh_ops
    from gssr_tpu.ops.binning import bin_gaussians
    from gssr_tpu.ops.blend_pallas import (CHUNK, _blend_core,
                                           blend_pallas,
                                           pack_instance_attrs)
    from gssr_tpu.ops.projection import TILE, preprocess
    from gssr_tpu.ops.rasterize import rasterize

    W, H, N, CAP = args.width, args.height, args.n, args.cap
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

    res = {}

    # ---- stage 1: preprocess + SH -------------------------------------
    def stage_pre(means, scales, rots, opac, sh):
        p = preprocess(means, scales, rots, camarr, W, H, opacity=opac)
        c = sh_ops.sh_to_color(3, sh, means, camarr.campos)
        return p.mean2d, p.conic, p.depth, p.rect, p.tiles_touched, \
            p.tile_mask, c
    res["preprocess+sh"] = timeit(jax.jit(_scalarize(stage_pre)),
                                  means, scales, rots, opac, sh,
                                  iters=args.iters)
    m2d, conic, depth, rect, tiles, tmask, color = jax.block_until_ready(
        jax.jit(stage_pre)(means, scales, rots, opac, sh))

    # ---- stage 2: binning ----------------------------------------------
    def stage_bin(rect, depth, tiles, tmask):
        b = bin_gaussians(rect, depth, tiles, tiles_x, tiles_y, CAP,
                          chunk=CHUNK, tile_mask=tmask)
        return b.gauss_id, b.hit, b.tile_ranges, b.chunk_map
    res["binning"] = timeit(jax.jit(_scalarize(stage_bin)),
                            rect, depth, tiles, tmask, iters=args.iters)
    binning = jax.block_until_ready(
        jax.jit(lambda *a: bin_gaussians(
            a[0], a[1], a[2], tiles_x, tiles_y, CAP, chunk=CHUNK,
            tile_mask=a[3]))(rect, depth, tiles, tmask))
    print("num_rendered:", int(binning.num_rendered),
          "padded:", int(binning.tile_ranges[-1]),
          "overflow:", bool(binning.overflow))

    # ---- stage 3: pack gather (fwd) ------------------------------------
    def stage_pack(m2d, conic, color, opac):
        return pack_instance_attrs(m2d, conic, color, opac, binning)
    res["pack fwd"] = timeit(jax.jit(_scalarize(stage_pack)),
                             m2d, conic, color, opac, iters=args.iters)
    attrs = jax.block_until_ready(
        jax.jit(stage_pack)(m2d, conic, color, opac))

    # ---- stage 3b: pack bwd (the scatter-add) ---------------------------
    def stage_pack_grad(m2d, conic, color, opac):
        def f(m2d, conic, color, opac):
            a = pack_instance_attrs(m2d, conic, color, opac, binning)
            return jnp.sum(a * 1e-6)
        return jax.grad(f, argnums=(0, 1, 2, 3))(m2d, conic, color, opac)
    t_pack_both = timeit(jax.jit(_scalarize(stage_pack_grad)),
                         m2d, conic, color, opac, iters=args.iters)
    res["pack bwd (scatter)"] = t_pack_both - res["pack fwd"]

    # ---- stage 4: blend kernels ----------------------------------------
    def stage_blend_fwd(attrs):
        return _blend_core(attrs, binning.tile_ranges, binning.chunk_map,
                           binning.n_live_chunks, tiles_x, tiles_y)
    res["blend fwd kernel"] = timeit(jax.jit(_scalarize(stage_blend_fwd)),
                                     attrs, iters=args.iters)

    def stage_blend_both(attrs):
        def f(attrs):
            acc, fT = _blend_core(attrs, binning.tile_ranges,
                                  binning.chunk_map, binning.n_live_chunks,
                                  tiles_x, tiles_y)
            return jnp.sum(acc) + jnp.sum(fT)
        return jax.grad(f)(attrs)
    t_blend_both = timeit(jax.jit(_scalarize(stage_blend_both)),
                          attrs, iters=args.iters)
    res["blend bwd kernel"] = t_blend_both - res["blend fwd kernel"]

    # ---- full pipeline ---------------------------------------------------
    def full_fwd(means, scales, rots, opac, sh):
        return rasterize(means, scales, rots, opac, camarr, W, H, bg,
                         sh_coeffs=sh, sh_degree=3, instance_cap=CAP,
                         backend="pallas").image
    res["full fwd"] = timeit(jax.jit(_scalarize(full_fwd)),
                             means, scales, rots, opac, sh, iters=args.iters)

    def full_step(means, scales, rots, opac, sh):
        def loss_fn(*a):
            out = rasterize(*a[:4], camarr, W, H, bg, sh_coeffs=a[4],
                            sh_degree=3, instance_cap=CAP, backend="pallas")
            return jnp.mean(jnp.abs(out.image - tgt))
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            means, scales, rots, opac, sh)
    res["full fwd+bwd"] = timeit(jax.jit(_scalarize(full_step)),
                                 means, scales, rots, opac, sh,
                                 iters=args.iters)

    print(f"\n{'stage':<22} {'ms':>9}")
    for k, v in res.items():
        print(f"{k:<22} {v:9.2f}")
    mpix = W * H / 1e6
    print(f"\nfull step: {res['full fwd+bwd']:.1f} ms  "
          f"=> {mpix / res['full fwd+bwd'] * 1e3:.2f} Mpix/s")
    acc = (res["binning"] + res["pack fwd"] + res["pack bwd (scatter)"]
           + res["blend fwd kernel"] + res["blend bwd kernel"]
           + res["preprocess+sh"])
    print(f"sum of isolated stages: {acc:.1f} ms "
          f"(unattributed: {res['full fwd+bwd'] - acc:.1f} ms)")


if __name__ == "__main__":
    main()
