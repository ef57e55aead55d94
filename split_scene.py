#!/usr/bin/env python
"""Partition a large COLMAP scene into VastGaussian tiles.

Parity: /root/reference/split_scene.py. Usage:
    python split_scene.py --source-path S [--output-path O] \
        [--num-col 4 --num-row 1] [--max-num-images 200] \
        [--extend-ratio 0.1] [--visibility-threshold 0.5] \
        [--transform-file T]
"""
from __future__ import annotations

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize can pin a TPU plugin over the env var — honor an
    # explicit CPU request (smoke/CI runs on the virtual mesh)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-path", required=True)
    ap.add_argument("--output-path", default=None)
    ap.add_argument("--num-col", type=int, default=None)
    ap.add_argument("--num-row", type=int, default=None)
    ap.add_argument("--max-num-images", type=int, default=200)
    ap.add_argument("--extend-ratio", type=float, default=0.1)
    ap.add_argument("--visibility-threshold", type=float, default=0.5)
    ap.add_argument("--transform-file", default=None)
    ap.add_argument("--auto-align", action="store_true",
                    help="estimate the ground-plane alignment from the "
                         "model (stands in for colmap "
                         "model_orientation_aligner) before partitioning")
    ap.add_argument("--no-copy-images", action="store_true")
    args = ap.parse_args()

    from gssr_tpu.utils.partition import split_scene
    tiles = split_scene(
        args.source_path, args.output_path, args.num_col, args.num_row,
        args.max_num_images, args.extend_ratio, args.visibility_threshold,
        args.transform_file, copy_images=not args.no_copy_images,
        auto_align=args.auto_align)
    print(f"wrote {len(tiles)} tiles:")
    for t in tiles:
        print(" ", t)


if __name__ == "__main__":
    main()
