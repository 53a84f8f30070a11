from raytracer_tpu.utils.profiling import RenderStats, trace_profile
from raytracer_tpu.utils.checkpoint import render_resumable

__all__ = ["RenderStats", "trace_profile", "render_resumable"]
