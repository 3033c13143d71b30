from bazof_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
    "shuffle_count",
]
