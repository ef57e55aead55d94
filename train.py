#!/usr/bin/env python
"""Train a gaussian-splatting method on a COLMAP scene.

Parity: /root/reference/train.py. Usage:
    python train.py 3dgs --source-path /data/scene --output-path ./out
"""
from __future__ import annotations

import os
import random

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the machine's sitecustomize can register-and-pin a TPU plugin at
    # interpreter startup, silently overriding this env var — honor an
    # explicit CPU request (CI / smoke runs on the virtual mesh)
    import jax
    jax.config.update("jax_platforms", "cpu")

from gssr_tpu.configs.base import Config
from gssr_tpu.configs.cli import parse_config
from gssr_tpu.engine.trainer import Trainer


def main(config: Config):
    if config.trainer.load_config:
        # re-run a saved config wholesale (reference train.py:88-90),
        # under a fresh timestamped run dir rather than the original's
        from gssr_tpu.configs.base import load_config_yaml
        print(f"loading pre-set config from {config.trainer.load_config}")
        config = load_config_yaml(config.trainer.load_config)
        # fresh run dir: the loaded config carries the ORIGINAL timestamp
        # (the reference re-uses and silently overwrites that run dir)
        config.timestamp = "{timestamp}"
    if not config.source_path:
        raise SystemExit(
            "error: --source-path is required (a COLMAP scene directory)")
    config.set_timestamp()
    from gssr_tpu.parallel.launch import maybe_initialize_distributed
    maybe_initialize_distributed(config.machine)
    random.seed(config.machine.seed)
    np.random.seed(config.machine.seed)
    config.save_config()
    trainer = Trainer(config)
    trainer.setup()
    trainer.train()
    # completion marker: train_split.py skips tiles whose latest run has one
    (config.get_base_dir() / "DONE").write_text(
        f"iterations={config.trainer.iterations}\n")
    return trainer


def entrypoint():
    main(parse_config())


if __name__ == "__main__":
    entrypoint()
