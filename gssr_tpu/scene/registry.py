"""Scene class registry, keyed by scene-config class name."""
from __future__ import annotations


def _build():
    classes = {}
    from gssr_tpu.scene.vanilla import VanillaScene, VanillaSceneConfig
    classes["VanillaSceneConfig"] = VanillaScene
    for mod, cfg_name, cls_name in [
        ("gssr_tpu.scene.twodgs", "TwoDGSSceneConfig", "TwoDGSScene"),
        ("gssr_tpu.scene.scaffold", "ScaffoldSceneConfig", "ScaffoldScene"),
        ("gssr_tpu.scene.octree", "OctreeSceneConfig", "OctreeScene"),
        ("gssr_tpu.scene.scaffold_2dgs", "Scaffold2DGSSceneConfig",
         "Scaffold2DGSScene"),
        ("gssr_tpu.scene.octree_2dgs", "Octree2DGSSceneConfig",
         "Octree2DGSScene"),
        ("gssr_tpu.scene.pgsr", "PGSRSceneConfig", "PGSRScene"),
        ("gssr_tpu.scene.scaffold_pgsr", "ScaffoldPGSRSceneConfig",
         "ScaffoldPGSRScene"),
        ("gssr_tpu.scene.octree_pgsr", "OctreePGSRSceneConfig",
         "OctreePGSRScene"),
    ]:
        try:
            m = __import__(mod, fromlist=[cls_name])
            classes[cfg_name] = getattr(m, cls_name)
        except (ImportError, AttributeError):
            pass
    return classes


class _LazyRegistry(dict):
    def __missing__(self, key):
        self.update(_build())
        return dict.__getitem__(self, key)


SCENE_CLASSES = _LazyRegistry()
