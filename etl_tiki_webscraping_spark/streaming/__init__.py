from etl_tiki_webscraping_spark.streaming.events import (
    windowed_event_counts,
    windowed_event_counts_batch,
    streaming_dedup,
    foreach_batch_upsert,
)

__all__ = [
    "windowed_event_counts",
    "windowed_event_counts_batch",
    "streaming_dedup",
    "foreach_batch_upsert",
]
