"""Custom stateful streaming operators (applyInPandasWithState).

Beyond-reference: the reference has no stateful stream processing
(SURVEY §2.10). A training-data pipeline needs at least streaming
DEDUPLICATION — drop a document when its content key was already seen in
ANY earlier micro-batch — which requires keyed state that outlives a
batch. Spark's GroupState gives exactly that; state is per-key, sharded
across executors, checkpointed with the query (survives restarts), and
at 100 TB the key should be a content hash (bounded state per key,
~GroupStateTimeout for TTL eviction if the key space is unbounded)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def streaming_exact_dedup(
    stream: DataFrame, key_col: str, out_schema: StructType | str | None = None
) -> DataFrame:
    """Emit only the FIRST row ever seen per key (across micro-batches).

    Rows within one batch dedup by keeping the smallest pandas order;
    state stores a single seen-count per key. Output schema = input schema
    (pass out_schema when the input is a str-typed stream)."""
    schema = out_schema or stream.schema

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)  # .get is a property
        first = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            if seen == 0 and first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((seen + n,))
        if seen == 0 and first is not None:
            yield first

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            dedup,
            outputStructType=schema,
            stateStructType=StructType([StructField("seen", LongType())]),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_kmv_distinct(
    stream: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Cross-batch distinct-count estimation: maintain a per-key KMV
    sketch (the k smallest distinct 60-bit hashes) in GroupState and emit
    the refreshed estimate whenever a key receives rows — the streaming
    twin of pipeline.kmv_distinct, converging to the identical value
    because the sketch is a pure function of the value SET (batch
    boundaries, arrival order and duplication cannot change it).

    State is BOUNDED at k longs per key regardless of stream length —
    the property that makes this run forever at 100 TB/day where exact
    per-key distinct state (streaming_exact_dedup's regime) could not.
    The hash is computed JVM-side BEFORE the stateful exchange, so the
    pandas worker only merges integers."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType

    from vecgo_spark.functions.hashing import stable_hash64

    hashed = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        stable_hash64(F.col(value_col).cast("string")).alias("h"),
    )
    out_schema = StructType([
        StructField("grp", StringType()),
        StructField("n_min", LongType()),
        StructField("kth", LongType()),
        StructField("est_distinct", DoubleType()),
    ])
    state_schema = StructType([StructField("mins", ArrayType(LongType()))])

    def upd(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
        mins = list(state.get[0]) if state.exists else []
        s = set(mins)
        for pdf in pdfs:
            s.update(int(h) for h in pdf["h"])
        mins = sorted(s)[:k]
        state.update((mins,))
        n_min = len(mins)
        if n_min < k:
            est = float(n_min)
        else:
            est = float(k - 1) / (float(mins[-1]) / float(1 << 60))
        # kth (the sketch's k-min bound) only shrinks as data arrives —
        # consumers can pick the freshest emission per key by min(kth)
        yield pd.DataFrame({"grp": [key[0]], "n_min": [n_min],
                            "kth": [mins[-1] if mins else 0],
                            "est_distinct": [est]})

    return (
        hashed.groupBy("grp")
        .applyInPandasWithState(
            upd,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
