from top_down_renderer_tpu.io.replay import (
    Bag,
    benchmark_conv,
    benchmark_loc,
    gps_to_meters,
    integrate_gps_distance,
    replay,
)

__all__ = [
    "Bag",
    "benchmark_conv",
    "benchmark_loc",
    "gps_to_meters",
    "integrate_gps_distance",
    "replay",
]
