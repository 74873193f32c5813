from .ops import (  # noqa: F401
    continuous_rollup,
    read_events_kafka,
    read_events_stream,
    run_to_memory,
    session_rollup,
    sliding_rollup,
    stream_dedup,
    stream_stream_join,
    threshold_alerts,
    tumbling_rollup,
    with_drift_state,
    with_drift_state_v2,
)
