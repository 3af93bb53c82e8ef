from top_down_renderer_tpu.filter.filter import ParticleFilter

__all__ = ["ParticleFilter"]
