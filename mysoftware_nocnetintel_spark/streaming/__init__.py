from .ops import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    session_rollup,
    sliding_rollup,
    stream_dedup,
    threshold_alerts,
    tumbling_rollup,
    with_drift_state,
)
