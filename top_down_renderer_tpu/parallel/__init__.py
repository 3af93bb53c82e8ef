from top_down_renderer_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_step,
    shard_filter_state,
)

__all__ = ["make_mesh", "make_sharded_step", "shard_filter_state"]
