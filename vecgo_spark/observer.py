"""MetricsObserver — per-operation engine callbacks.

Mirror of the reference's observer interface
(internal/engine/metrics.go:6-25): write path (OnInsert/OnDelete), read
path (OnSearch/OnGet), background ops (OnFlush/OnCompaction/OnBuild).
Latencies are seconds. The base class is the no-op implementation
(NoopMetricsObserver, metrics.go:28-41) — subclass and override what you
need, attach with ``VectorTable.set_observer`` (≙ vecgo.WithMetrics).

Spark-specific semantics, stated honestly:
  * insert/delete/compact are EAGER (they write parquet), so their
    latencies are true operation latencies;
  * search()/get() return lazy DataFrames — on_search/on_get latency
    covers planning (segment pruning, probe selection, plan build), not
    executor time, and is fired from search_with_stats/get with the
    driver-side stats the planner knows (segments pruned, k, strategy);
  * on_flush fires per committed micro-batch from streaming ingest —
    the foreachBatch flush IS the memtable flush (engine.go:904-918).
"""

from __future__ import annotations


class MetricsObserver:
    """No-op base (subclass = the plugin shape)."""

    # -- write path
    def on_insert(self, latency_s: float, rows: int, bytes_: int,
                  error: Exception | None = None) -> None:
        pass

    def on_delete(self, latency_s: float, rows: int,
                  error: Exception | None = None) -> None:
        pass

    # -- read path
    def on_search(self, latency_s: float, strategy: str, k: int,
                  segments_searched: int,
                  error: Exception | None = None) -> None:
        pass

    def on_get(self, latency_s: float, error: Exception | None = None) -> None:
        pass

    # -- background operations
    def on_flush(self, latency_s: float, rows: int, version: int,
                 error: Exception | None = None) -> None:
        pass

    def on_compaction(self, latency_s: float, dropped: int, created: int,
                      error: Exception | None = None) -> None:
        pass

    def on_build(self, latency_s: float, index_type: str,
                 error: Exception | None = None) -> None:
        pass


class RecordingObserver(MetricsObserver):
    """Collects every event as (name, kwargs) — handy for tests and for
    exporting to any metrics sink."""

    def __init__(self):
        self.events: list[tuple[str, dict]] = []

    def _rec(self, name, **kw):
        self.events.append((name, kw))

    def on_insert(self, latency_s, rows, bytes_, error=None):
        self._rec("insert", latency_s=latency_s, rows=rows, bytes=bytes_, error=error)

    def on_delete(self, latency_s, rows, error=None):
        self._rec("delete", latency_s=latency_s, rows=rows, error=error)

    def on_search(self, latency_s, strategy, k, segments_searched, error=None):
        self._rec("search", latency_s=latency_s, strategy=strategy, k=k,
                  segments_searched=segments_searched, error=error)

    def on_get(self, latency_s, error=None):
        self._rec("get", latency_s=latency_s, error=error)

    def on_flush(self, latency_s, rows, version, error=None):
        self._rec("flush", latency_s=latency_s, rows=rows, version=version, error=error)

    def on_compaction(self, latency_s, dropped, created, error=None):
        self._rec("compaction", latency_s=latency_s, dropped=dropped,
                  created=created, error=error)

    def on_build(self, latency_s, index_type, error=None):
        self._rec("build", latency_s=latency_s, index_type=index_type, error=error)
