from top_down_renderer_tpu.tools.refine import MapRefiner

__all__ = ["MapRefiner"]
