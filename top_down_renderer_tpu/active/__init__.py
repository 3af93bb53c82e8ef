from top_down_renderer_tpu.active.localizer import (
    ActiveLocalizer,
    get_best_rel_pos,
)

__all__ = ["ActiveLocalizer", "get_best_rel_pos"]
