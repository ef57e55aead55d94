#!/usr/bin/env python
"""Train every tile of a partitioned scene.

Parity: /root/reference/train_split.py (sequential per-tile training), plus
a TPU-native extension: with --parallel-hosts N / --host-rank R, tile t is
trained when t % N == R, so a multi-host fleet trains tiles embarrassingly
parallel (the reference is strictly sequential, SURVEY §2.3).
"""
from __future__ import annotations

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize can pin a TPU plugin over the env var — honor an
    # explicit CPU request (smoke/CI runs on the virtual mesh)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import copy
import glob
import os

from gssr_tpu.configs.cli import parse_config


def main():
    config = parse_config()
    assert config.source_path, "--source-path required"
    tiles = sorted(glob.glob(os.path.join(config.source_path, "tile_*")))
    assert tiles, f"no tile_* dirs under {config.source_path}"
    # multi-host fleet: rank/world size come from jax.distributed when a
    # coordinator is configured (one process per TPU host), else from the
    # --machine.num-hosts/host-rank flags
    from gssr_tpu.parallel.launch import maybe_initialize_distributed
    maybe_initialize_distributed(config.machine)
    n_hosts = max(config.machine.num_hosts, 1)
    rank = config.machine.host_rank
    config.set_experiment_name()
    config.set_timestamp()

    import train as train_mod
    trained, skipped = [], []
    for i, tile_dir in enumerate(tiles):
        if i % n_hosts != rank:
            continue
        tcfg = copy.deepcopy(config)
        tcfg.source_path = tile_dir
        tcfg.experiment_name = os.path.join(
            config.experiment_name, os.path.basename(tile_dir))
        # resumable tile sweep: a DONE marker (written by train.main after
        # the final save) in any prior run of this tile/method skips it —
        # the reference always retrains every tile (SURVEY §5 deficiency)
        done = glob.glob(os.path.join(
            config.output_path, tcfg.experiment_name,
            str(config.method_name), "*", "DONE"))
        if done and not config.retrain:
            print(f"=== skipping {tile_dir} (done: {done[-1]}; "
                  "--retrain true to force) ===")
            skipped.append(tile_dir)
            continue
        print(f"=== training {tile_dir} ({i + 1}/{len(tiles)}) ===")
        train_mod.main(tcfg)
        trained.append(tile_dir)
    print(f"trained {len(trained)} tiles (skipped {len(skipped)} done) "
          f"on host {rank}/{n_hosts}")


if __name__ == "__main__":
    main()
