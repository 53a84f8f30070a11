from raytracer_tpu.core.types import Scene, SceneStatic
