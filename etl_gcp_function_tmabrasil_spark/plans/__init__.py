from etl_gcp_function_tmabrasil_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "count_exchanges",
]
