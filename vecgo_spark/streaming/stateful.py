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


def streaming_rolling_anomaly(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    frame: int = 100,
    min_n: int = 20,
    z: int = 2,
) -> DataFrame:
    """Streaming twin of windows.rolling_anomaly: per key, a value flags
    iff it sits more than `z` standard deviations from the mean of the
    PRECEDING `frame` values — the same (n, Σx, Σx²) integer
    cross-multiplied test, held in GroupState instead of a window frame.

    State is BOUNDED at `frame` longs per key regardless of stream
    length (the deque of recent x_e2 values); x_e2 is computed JVM-side
    before the stateful exchange, so the pandas worker only folds
    integers. Rows are processed in (ts, id) order WITHIN each
    micro-batch; cross-batch parity with the batch operator assumes
    in-order arrival per key (enforce upstream with a watermark + sort,
    the standard streaming ordering contract). Python integers are
    arbitrary-precision, so in-range results match the batch operator's
    guarded int64 math exactly — and out-of-range values raise the SAME
    overflow error the batch guard raises (anomaly_x_limit), keeping the
    twins in lockstep on bad input too."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, DoubleType, TimestampType

    from vecgo_spark.streaming.windows import anomaly_x_limit

    limit = anomaly_x_limit(frame, z)

    prepped = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.round(F.col(value_col) * 100).cast("long").alias("x_e2"),
    )
    out_schema = StructType([
        StructField("event_id", LongType()),
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("n", LongType()),
        StructField("is_anomaly", BooleanType()),
    ])
    from pyspark.sql.types import ArrayType

    state_schema = StructType([StructField("win", ArrayType(LongType()))])

    def upd(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
        win = list(state.get[0]) if state.exists else []
        s1 = sum(win)
        s2 = sum(v * v for v in win)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
        ids, tss, vals, ns, flags = [], [], [], [], []
        for _, row in pdf.iterrows():
            x = int(row["x_e2"])
            if abs(x) > limit:
                raise ValueError(
                    f"rolling_anomaly overflow guard: |x_e2|={abs(x)} exceeds "
                    f"{limit} (frame={frame}, z={z}) — the integer z-test "
                    "would wrap; rescale the value column")
            n = len(win)
            dev = n * x - s1
            flags.append(bool(n >= min_n and dev * dev > z * z * (n * s2 - s1 * s1)))
            ids.append(int(row["id"]))
            tss.append(row["ts"])
            vals.append(float(row["value"]))
            ns.append(n)
            win.append(x)
            s1 += x
            s2 += x * x
            if len(win) > frame:
                old = win.pop(0)
                s1 -= old
                s2 -= old * old
        state.update((win,))
        yield pd.DataFrame({
            "event_id": ids, "key": [key[0]] * len(ids), "ts": tss,
            "value": vals, "n": ns, "is_anomaly": flags,
        })

    return (
        prepped.groupBy("key")
        .applyInPandasWithState(
            upd,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
