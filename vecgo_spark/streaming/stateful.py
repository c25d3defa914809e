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
from pyspark.sql.types import LongType, StructField, StructType


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
