from .events import (
    read_event_stream,
    run_available_now,
    session_windows,
    tumbling_counts,
)

__all__ = ["read_event_stream", "run_available_now",
           "session_windows", "tumbling_counts"]
