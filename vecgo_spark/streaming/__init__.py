from vecgo_spark.streaming.ingest import ingest_stream  # noqa: F401
from vecgo_spark.streaming.stateful import streaming_exact_dedup  # noqa: F401
from vecgo_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_counts,
    tumbling_agg,
)
