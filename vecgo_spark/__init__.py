"""vecgo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the hupe1980/vecgo hybrid vector database.

Architecture (see SURVEY.md):
  - One logical collection = one DataFrame ``(id LONG, vector ARRAY<FLOAT>,
    <typed metadata cols>, payload BINARY, text STRING)`` over immutable
    parquet segments + a JSON versioned manifest (time travel, tombstones).
  - Search = declarative DataFrame plans (scan → pushed filter → native
    distance expression → deterministic top-k window), NOT a graph index:
    Catalyst + Tungsten pick the physical strategy; IVF (KMeans cluster
    pruning) is the approximate scale path, mirroring the reference's
    flat-segment IVF design (internal/segment/flat/segment.go:727-745).
  - All distance math is JVM-side (`F.aggregate`/`F.zip_with`) in the hot
    path; numpy/pandas UDFs only for quantization codecs.
"""

from vecgo_spark.session import get_spark


def __getattr__(name):
    # lazy re-exports so `import vecgo_spark` stays cheap
    if name == "VectorTable":
        from vecgo_spark.plans.table import VectorTable

        return VectorTable
    if name == "FilterSet":
        from vecgo_spark.filters import FilterSet

        return FilterSet
    if name == "QueryStats":
        from vecgo_spark.explain import QueryStats

        return QueryStats
    raise AttributeError(name)


__all__ = ["get_spark", "VectorTable", "FilterSet", "QueryStats"]
__version__ = "0.1.0"
