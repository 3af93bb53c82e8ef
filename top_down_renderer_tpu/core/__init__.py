from top_down_renderer_tpu.core.grids import (
    FilterState,
    Particles,
    SemanticMapGrid,
)
from top_down_renderer_tpu.core.geometry import wrap_angle

__all__ = ["FilterState", "Particles", "SemanticMapGrid", "wrap_angle"]
