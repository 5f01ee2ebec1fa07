from citybikedatawarehouse_spark.streaming.windows import (  # noqa: F401
    dedup_within_watermark,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_avgs,
    tumbling_counts,
)
