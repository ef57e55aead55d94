"""Method registry: the 9 trainable method presets.

Parity: /root/reference/gssr/configs/method_config.py:43-149. The tyro
union is replaced by a plain registry + a small dotted-path CLI override
parser (configs/cli.py) since tyro is not available in this environment.
"""
from __future__ import annotations

from typing import Callable, Dict

from gssr_tpu.configs.base import (
    Config,
    DataLoaderConfig,
    MachineConfig,
    PartitionConfig,
    TrainerConfig,
)

# scene/gaussian config classes are imported lazily in the factories to keep
# `import gssr_tpu.configs` light; CONFIG_CLASSES is used for YAML rebuild.


def _vanilla():
    from gssr_tpu.models.vanilla import VanillaGaussianConfig
    from gssr_tpu.scene.vanilla import VanillaSceneConfig
    return Config(
        method_name="3dgs",
        scene=VanillaSceneConfig(
            dataloader=DataLoaderConfig(shuffle=True, llffhold=8,
                                        resolution=-1, images="images",
                                        white_background=False),
            gaussians=VanillaGaussianConfig(max_sh_degree=3,
                                            percent_dense=0.01),
            random_background=False,
            lambda_dssim=0.2))


def _twodgs():
    from gssr_tpu.models.twod import TwoDGaussianConfig
    from gssr_tpu.scene.twodgs import TwoDGSSceneConfig
    return Config(
        method_name="2dgs",
        scene=TwoDGSSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=TwoDGaussianConfig(),
            depth_ratio=0.0, lambda_normal=0.05, lambda_dist=0.0))


def _scaffold():
    from gssr_tpu.models.scaffold import ScaffoldGaussianConfig
    from gssr_tpu.scene.scaffold import ScaffoldSceneConfig
    return Config(
        method_name="scaffold-gs",
        scene=ScaffoldSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=ScaffoldGaussianConfig(),
            lambda_scaling=0.01))


def _octree():
    from gssr_tpu.models.octree import OctreeGaussianConfig
    from gssr_tpu.scene.octree import OctreeSceneConfig
    return Config(
        method_name="octree-gs",
        scene=OctreeSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=OctreeGaussianConfig()))


def _scaffold_2dgs():
    from gssr_tpu.models.scaffold import ScaffoldGaussianConfig
    from gssr_tpu.scene.scaffold_2dgs import Scaffold2DGSSceneConfig
    return Config(
        method_name="scaffold-2dgs",
        scene=Scaffold2DGSSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=ScaffoldGaussianConfig()))


def _octree_2dgs():
    from gssr_tpu.models.octree import OctreeGaussianConfig
    from gssr_tpu.scene.octree_2dgs import Octree2DGSSceneConfig
    return Config(
        method_name="octree-2dgs",
        scene=Octree2DGSSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=OctreeGaussianConfig()))


def _pgsr():
    from gssr_tpu.models.pgsr import PGSRGaussianConfig
    from gssr_tpu.scene.pgsr import PGSRSceneConfig
    return Config(
        method_name="pgsr",
        scene=PGSRSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=PGSRGaussianConfig()))


def _scaffold_pgsr():
    from gssr_tpu.models.scaffold import ScaffoldGaussianConfig
    from gssr_tpu.scene.scaffold_pgsr import ScaffoldPGSRSceneConfig
    return Config(
        method_name="scaffold-pgsr",
        scene=ScaffoldPGSRSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=ScaffoldGaussianConfig()))


def _octree_pgsr():
    from gssr_tpu.models.octree import OctreeGaussianConfig
    from gssr_tpu.scene.octree_pgsr import OctreePGSRSceneConfig
    return Config(
        method_name="octree-pgsr",
        scene=OctreePGSRSceneConfig(
            dataloader=DataLoaderConfig(),
            gaussians=OctreeGaussianConfig()))


METHOD_FACTORIES: Dict[str, Callable[[], Config]] = {
    "3dgs": _vanilla,
    "2dgs": _twodgs,
    "scaffold-gs": _scaffold,
    "octree-gs": _octree,
    "scaffold-2dgs": _scaffold_2dgs,
    "octree-2dgs": _octree_2dgs,
    "pgsr": _pgsr,
    "scaffold-pgsr": _scaffold_pgsr,
    "octree-pgsr": _octree_pgsr,
}

DESCRIPTIONS = {
    "3dgs": "Vanilla 3D Gaussian Splatting",
    "scaffold-gs": "Scaffold-GS (anchors + neural-gaussian MLPs)",
    "octree-gs": "Octree-GS (LOD anchors)",
    "2dgs": "2DGS surfel splatting",
    "scaffold-2dgs": "Scaffold-GS + 2DGS",
    "octree-2dgs": "Octree-GS + 2DGS",
    "pgsr": "PGSR planar splatting with multi-view regularization",
    "scaffold-pgsr": "Scaffold-GS + PGSR",
    "octree-pgsr": "Octree-GS + PGSR",
}


def get_method_config(name: str) -> Config:
    if name not in METHOD_FACTORIES:
        raise KeyError(f"unknown method {name!r}; available: "
                       f"{sorted(METHOD_FACTORIES)}")
    return METHOD_FACTORIES[name]()


def build_scene(config: Config, **kwargs):
    """Instantiate the scene class matching the scene config's type."""
    scene_cfg = config.scene
    name = type(scene_cfg).__name__
    from gssr_tpu.scene import SCENE_CLASSES
    cls = SCENE_CLASSES[name]
    return cls(scene_cfg, config.source_path, eval=config.eval,
               seed=config.machine.seed, **kwargs)


def _config_classes():
    """Name -> class map for YAML round-trips."""
    classes = [Config, MachineConfig, TrainerConfig, PartitionConfig,
               DataLoaderConfig]
    try:
        from gssr_tpu.models.vanilla import VanillaGaussianConfig
        from gssr_tpu.scene.vanilla import VanillaSceneConfig
        classes += [VanillaGaussianConfig, VanillaSceneConfig]
    except ImportError:
        pass
    for mod, names in [
        ("gssr_tpu.models.twod", ["TwoDGaussianConfig"]),
        ("gssr_tpu.scene.twodgs", ["TwoDGSSceneConfig"]),
        ("gssr_tpu.models.scaffold", ["ScaffoldGaussianConfig"]),
        ("gssr_tpu.scene.scaffold", ["ScaffoldSceneConfig"]),
        ("gssr_tpu.models.octree", ["OctreeGaussianConfig"]),
        ("gssr_tpu.scene.octree", ["OctreeSceneConfig"]),
        ("gssr_tpu.scene.scaffold_2dgs", ["Scaffold2DGSSceneConfig"]),
        ("gssr_tpu.scene.octree_2dgs", ["Octree2DGSSceneConfig"]),
        ("gssr_tpu.models.pgsr", ["PGSRGaussianConfig"]),
        ("gssr_tpu.scene.pgsr", ["PGSRSceneConfig"]),
        ("gssr_tpu.scene.scaffold_pgsr", ["ScaffoldPGSRSceneConfig"]),
        ("gssr_tpu.scene.octree_pgsr", ["OctreePGSRSceneConfig"]),
    ]:
        try:
            m = __import__(mod, fromlist=names)
            classes += [getattr(m, n) for n in names]
        except (ImportError, AttributeError):
            pass
    return {c.__name__: c for c in classes}


class _LazyClasses(dict):
    def __missing__(self, key):
        self.update(_config_classes())
        return dict.__getitem__(self, key)


CONFIG_CLASSES = _LazyClasses()
