from top_down_renderer_tpu.render.semantic import (
    render_semantic_polar,
    render_semantic_cartesian,
)
from top_down_renderer_tpu.render.geometric import (
    render_geometric_polar,
    render_geometric_cartesian,
)

__all__ = [
    "render_semantic_polar",
    "render_semantic_cartesian",
    "render_geometric_polar",
    "render_geometric_cartesian",
]
