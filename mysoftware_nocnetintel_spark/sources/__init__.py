from . import avro_lite, delta, iceberg, readers, sinks  # noqa: F401
from .registry import (  # noqa: F401
    TABLES,
    load_table,
    policy_view,
    register_policy_view,
    register_views,
    table_path,
)
