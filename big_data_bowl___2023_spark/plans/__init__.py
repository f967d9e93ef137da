from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filters,
    formatted_plan,
)

__all__ = ["assert_broadcast_join", "assert_no_cartesian",
           "assert_partition_pruned", "assert_pushed_filters",
           "formatted_plan"]
