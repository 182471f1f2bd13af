from .inspect import (  # noqa: F401
    broadcast_build_subtrees,
    broadcast_join_count,
    exchange_count,
    final_adaptive_plan,
    formatted_plan,
    pushed_filters,
    python_eval_count,
    read_schema_columns,
    shuffle_joins_on_key,
)
