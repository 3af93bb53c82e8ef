from top_down_renderer_tpu.runtime.node import (
    PoseWithCovariance,
    TopDownRenderNode,
)

__all__ = ["PoseWithCovariance", "TopDownRenderNode"]
