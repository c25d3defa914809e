"""Streaming ingest — Structured Streaming → VectorTable micro-batches.

Reference mapping (SURVEY §2.10): vecgo's "streaming" is ingestion
freshness — a memtable absorbing inserts, auto-flushed at 64 MB into an
immutable L0 segment (internal/engine/engine.go:124-129,904-918, flush
loop 2313-2328), plus a background compaction loop (engine.go:2329-2394).

Spark mapping: each foreachBatch micro-batch IS one memtable flush — the
batch is staged as a parquet segment and commit() publishes manifest
version N+1, so OTHER readers see rows exactly at the commit boundary
(read-committed). The writer session itself gets the reference's
read-your-writes semantics (engine.go:833-921) via
``table.df(include_pending=True)`` / ``search(include_pending=True)``:
committed segments ∪ staged-but-uncommitted segments and tombstones. The
optional auto-compaction mirrors the reference's CompactionThreshold
policy (internal/engine/policy.go:25-230)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from vecgo_spark.plans.table import VectorTable


def ingest_stream(
    stream_df: DataFrame,
    table: VectorTable,
    checkpoint_dir: str,
    assign_ids: bool = True,
    compact_at_segments: int | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> Any:
    """Start a streaming write into `table`; returns the StreamingQuery.

    One micro-batch ≙ one flushed L0 segment + one committed manifest
    version. `compact_at_segments` triggers an inline compaction when the
    live segment count exceeds it (tiered-compaction analog; at scale this
    would be a separate scheduled job — inline here keeps the single-writer
    invariant the manifest requires)."""

    def _flush(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.insert(batch_df, assign_ids=assign_ids)
        table.commit()
        if compact_at_segments and len(table.manifest.segments) > compact_at_segments:
            table.compact()

    writer = stream_df.writeStream.foreachBatch(_flush).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
