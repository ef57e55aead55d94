"""Typed dataclass config tree.

Parity: /root/reference/gssr/configs/base_config.py — same shape
(Machine/Trainer/Partition/Config) and output-dir layout. Differences by
design: configs serialize as plain YAML data (dict tree + method name), not
pickled live objects, and `_target` factories are replaced by an explicit
method registry (configs/methods.py) — safer round-trips, no yaml.Loader
code execution.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import yaml


@dataclass
class MachineConfig:
    seed: int = 42
    num_hosts: int = 1
    host_rank: int = 0
    # multi-chip training mode: "none" | "dp" (one camera per device,
    # grads all-reduced over ICI) | "band" (one camera, tile rows sharded
    # across devices). SURVEY §2.3; the reference refuses world_size>1.
    parallel: str = "none"
    # devices to use for the parallel mode; 0 = all local devices
    num_devices: int = 0
    # bring up jax.distributed at launch (multi-process / multi-host).
    # Also triggered by GSSR_COORDINATOR / GSSR_NUM_PROCESSES env vars;
    # see gssr_tpu/parallel/launch.py. The reference's dist_url analogue
    # is dead code (reference train.py:78-80 refuses world_size > 1).
    dist_init: bool = False


@dataclass
class TrainerConfig:
    iterations: int = 30_000
    test_iterations: List[int] = field(default_factory=lambda: [30_000])
    save_iterations: List[int] = field(default_factory=lambda: [30_000])
    relative_gaussian_dir: str = "point_cloud/"
    checkpoint_iterations: List[int] = field(default_factory=list)
    relative_ckpt_dir: str = "chkpnt/"
    save_only_latest_checkpoint: bool = False
    load_ckpt_dir: Optional[str] = None
    load_ckpt_step: Optional[int] = None
    load_gaussian_dir: Optional[str] = None
    load_gaussian_step: Optional[int] = None
    load_config: Optional[str] = None
    log_interval: int = 10
    profile_dir: Optional[str] = None
    profile_steps: List[int] = field(default_factory=lambda: [100, 110])
    # K consecutive train steps per device dispatch (lax.scan over a
    # prefetched camera/GT batch). Each dispatch through a remote/tunneled
    # chip pays a host round trip for its fresh inputs; K steps per
    # dispatch amortize it K-fold. Blocks auto-shrink to end exactly on
    # densify/opacity-reset/SH-ramp/eval/save boundaries; 1 disables.
    # Ignored in parallel modes and for the pgsr family (two-camera step).
    scan_block: int = 16


@dataclass
class PartitionConfig:
    need_partition: bool = True
    num_col: int = 4
    num_row: int = 1
    extend_ratio: float = 0.1
    visibility_threshold: float = 0.5
    config_of_tiles: List[str] = field(default_factory=list)


@dataclass
class DataLoaderConfig:
    shuffle: bool = True
    llffhold: int = 8
    resolution_scales: List[float] = field(default_factory=lambda: [1.0])
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    # load GT frames on demand through a bounded LRU instead of resident
    # float32 arrays — for UAV-scale scenes (dataio.dataset.LazyImage)
    lazy_images: bool = False
    image_cache_frames: int = 256


@dataclass
class Config:
    source_path: Optional[str] = None
    output_path: str = "./output"
    method_name: Optional[str] = None
    experiment_name: Optional[str] = None
    timestamp: str = "{timestamp}"
    eval: bool = False
    # train_split.py only: retrain tiles that already have a DONE marker
    # (default is to skip them, making tile sweeps resumable — SURVEY §5
    # flags the reference's always-retrain behaviour as a deficiency)
    retrain: bool = False

    machine: MachineConfig = field(default_factory=MachineConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    scene: object = None          # method-specific SceneConfig
    partitioner: PartitionConfig = field(default_factory=PartitionConfig)

    writer: str = "tensorboard"
    relative_log_dir: str = "logs"

    def set_experiment_name(self):
        if self.experiment_name is None:
            self.experiment_name = str(self.source_path).rstrip("/").split("/")[-1]

    def set_timestamp(self):
        if self.timestamp == "{timestamp}":
            self.timestamp = datetime.now().strftime("%Y-%m-%d_%H%M%S")

    def get_base_dir(self) -> Path:
        assert self.method_name is not None, "method name not set"
        self.set_experiment_name()
        return Path(self.output_path) / self.experiment_name / \
            self.method_name / self.timestamp

    def get_gaussian_dir(self) -> Path:
        return self.get_base_dir() / self.trainer.relative_gaussian_dir

    def get_checkpoint_dir(self) -> Path:
        return self.get_base_dir() / self.trainer.relative_ckpt_dir

    def save_config(self):
        d = self.get_base_dir()
        d.mkdir(parents=True, exist_ok=True)
        save_config_yaml(self, d / "config.yml")


# ---------------------------------------------------------------------------
# Plain-data YAML round-trip
# ---------------------------------------------------------------------------

def _to_plain(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {"__dataclass__": type(obj).__name__,
                **{f.name: _to_plain(getattr(obj, f.name))
                   for f in dataclasses.fields(obj)}}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


def save_config_yaml(config: Config, path):
    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(config), f, sort_keys=False)


def load_config_yaml(path) -> Config:
    """Rebuild the typed config tree from plain YAML via the class registry."""
    from gssr_tpu.configs.methods import CONFIG_CLASSES

    def rebuild(node):
        if isinstance(node, dict) and "__dataclass__" in node:
            cls = CONFIG_CLASSES[node["__dataclass__"]]
            kwargs = {k: rebuild(v) for k, v in node.items()
                      if k != "__dataclass__"}
            return cls(**kwargs)
        if isinstance(node, list):
            return [rebuild(v) for v in node]
        return node

    with open(path) as f:
        data = yaml.safe_load(f)
    return rebuild(data)
