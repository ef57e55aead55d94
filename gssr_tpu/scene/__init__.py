from gssr_tpu.scene.registry import SCENE_CLASSES

__all__ = ["SCENE_CLASSES"]
