from .events import (
    funnel_detect,
    funnel_detect_batch,
    read_event_stream,
    run_available_now,
    session_windows,
    tumbling_counts,
)

__all__ = ["funnel_detect", "funnel_detect_batch", "read_event_stream",
           "run_available_now", "session_windows", "tumbling_counts"]
