from top_down_renderer_tpu.maps.edt import edt, compute_dists
from top_down_renderer_tpu.maps.polar import polar_stencil
from top_down_renderer_tpu.maps.map import TopDownMap

__all__ = ["edt", "compute_dists", "polar_stencil", "TopDownMap"]
