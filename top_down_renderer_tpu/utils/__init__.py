from top_down_renderer_tpu.utils.checkpoint import (
    load_filter_state,
    save_filter_state,
)
from top_down_renderer_tpu.utils.tracing import StepTimer, trace_span

__all__ = [
    "load_filter_state",
    "save_filter_state",
    "StepTimer",
    "trace_span",
]
