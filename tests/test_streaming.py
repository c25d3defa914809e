"""Streaming: micro-batch ingest into VectorTable (each batch → one L0
segment + manifest version, the memtable-flush analog engine.go:904-918)
and event-time window helpers (batch/stream parity)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vecgo_spark.plans.table import VectorTable
from vecgo_spark.sources.registry import load_table
from vecgo_spark.streaming import ingest_stream, session_agg, sliding_counts, tumbling_agg


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = str(tmp_path / "tbl")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_microbatches(spark, tmp_path, tmp_table_dir):
    """Two source files → availableNow stream → table holds all rows,
    version advanced, data searchable after the stream commits."""
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    rows1 = [(float(i), [float(i), 0.0]) for i in range(50)]
    rows2 = [(float(i + 50), [0.0, float(i)]) for i in range(30)]
    schema = "payload DOUBLE, vector ARRAY<DOUBLE>"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src_dir + "/b1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src_dir + "/b2")

    table = VectorTable.create(spark, tmp_table_dir, dim=2, metric="l2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*/")
    )
    q = ingest_stream(stream, table, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert table.count() == 80
    assert table.manifest.version > 1
    assert len(table.manifest.segments) >= 1
    top = table.search([1.0, 0.0], k=1).first()
    assert top is not None

    # restart with a new file → only the new rows are ingested (checkpoint)
    spark.createDataFrame([(999.0, [9.0, 9.0])], schema).coalesce(1).write.parquet(src_dir + "/b3")
    q2 = ingest_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src_dir + "/*/"),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert table.count() == 81


def test_stream_ingest_auto_compact(spark, tmp_path, tmp_table_dir):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    schema = "payload DOUBLE, vector ARRAY<DOUBLE>"
    for b in range(4):
        spark.createDataFrame(
            [(float(b * 10 + i), [float(b), float(i)]) for i in range(10)], schema
        ).coalesce(1).write.parquet(f"{src_dir}/b{b}")
    table = VectorTable.create(spark, tmp_table_dir, dim=2, metric="l2")
    q = ingest_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src_dir + "/*/"),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        compact_at_segments=2,
    )
    q.awaitTermination(180)
    assert table.count() == 40
    assert len(table.manifest.segments) <= 3  # compaction kept it bounded


def test_tumbling_agg_stream_matches_batch(spark, sf_dir, tmp_path):
    """The same tumbling query over events as a STREAM (availableNow +
    watermark) and as a batch must agree — batch/stream parity."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n")]
    batch = {
        (r["ws"], r["event_type"]): r["n"]
        for r in tumbling_agg(ev, "ts", "1 hour", ["event_type"], aggs).collect()
    }

    src = str(tmp_path / "evsrc")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "2").parquet(src)
    out = tumbling_agg(stream, "ts", "1 hour", ["event_type"], aggs, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    # append-mode only emits windows the watermark has closed; every emitted
    # window must match batch exactly, and most windows must have closed
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert batch[k] == v
    assert len(got) >= len(batch) * 0.8


def test_session_window_matches_gaps_and_islands(spark, sf_dir):
    """Two independent sessionization implementations must agree:
    F.session_window (streaming/windows.py) vs the lag+running-sum
    gaps-and-islands query (__spark_entry__._events_sessionization)."""
    import __spark_entry__ as entry

    gi = entry._events_sessionization(spark, sf_dir)
    gi_sessions = sorted(
        (r["user_id"], r["ws"], r["we"], r["n_events"]) for r in gi.collect()
    )
    sw = session_agg(
        load_table(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("mn"), F.max("ts").alias("mx")],
    )
    sw_sessions = sorted(
        (r["user_id"], r["mn"], r["mx"], r["n_events"]) for r in sw.collect()
    )
    assert gi_sessions == sw_sessions


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """session_agg run as a real STREAM (availableNow, watermark, state
    merging sessions across micro-batches) must agree with the batch
    gaps-and-islands twin. Watermark semantics: append mode only emits a
    session once the watermark passes its close (last event + gap), so
    the stream's output is a subset of the batch sessions — every emitted
    session must match exactly, and all but the tail near max(ts) must
    have closed (2h watermark ≫ 30m gap → only sessions still open in
    the final 2.5h can be withheld)."""
    import __spark_entry__ as entry

    gi = entry._events_sessionization(spark, sf_dir)
    batch = {
        (r["user_id"], r["ws"]): (r["we"], r["n_events"]) for r in gi.collect()
    }

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "evsrc_sess")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "2").parquet(src)
    # session_window's `we` is last-event + gap (the close time), not the
    # last EVENT time the batch twin reports — compare max(ts) instead
    out = session_agg(
        stream, "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("mx")],
        watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("session_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["ws"]): (r["mx"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert batch[k] == v, f"session {k}: stream {v} != batch {batch[k]}"
    assert len(got) >= len(batch) * 0.8


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState keyed dedup: a key seen in batch 1 must be
    dropped when it reappears in batch 2 (state outlives the batch)."""
    from vecgo_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "key STRING, doc_id BIGINT"
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], schema
    ).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(
        [("a", 4), ("c", 5), ("b", 6), ("c", 7)], schema
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*/")
    )
    out = streaming_exact_dedup(stream, "key")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    keys = sorted(r["key"] for r in rows)
    assert keys == ["a", "b", "c"]  # exactly one row per key, ever


def test_sliding_and_session_windows_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(2000)
    slid = sliding_counts(ev, "ts", "2 hours", "1 hour", ["event_type"])
    total_rows = ev.count()
    # every row lands in exactly duration/slide = 2 windows
    assert slid.agg(F.sum("n")).first()[0] == 2 * total_rows
    sess = session_agg(
        ev, "ts", "5 minutes", ["user_id"], [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")]
    )
    r = sess.agg(F.sum("n")).first()
    assert r[0] == total_rows  # sessions partition the rows
    one = sess.first()
    assert one["we"] >= one["ws"]


def test_streaming_kmv_converges_to_batch_sketch(spark, tmp_path):
    """The cross-batch KMV sketch must end exactly where the batch sketch
    lands on the union of all batches — the sketch is a function of the
    value SET, so batch boundaries and duplicates change nothing. State
    stays bounded at k hashes per key."""
    from vecgo_spark.operators import pipeline
    from vecgo_spark.streaming.stateful import streaming_kmv_distinct

    k = 16
    schema = "src STRING, val STRING"
    rows1 = [("a", f"v{i}") for i in range(120)] + [("b", f"w{i}") for i in range(5)]
    rows2 = [("a", f"v{i}") for i in range(60, 200)] + [("b", f"w{i}") for i in range(5)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*/")
    )
    q = (
        streaming_kmv_distinct(stream, "src", "val", k=k)
        .writeStream.format("memory")
        .queryName("kmv_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last emission per key == batch sketch over the union
    # kth only shrinks as values arrive ⇒ min(kth) is the final sketch
    out = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER "
        "(PARTITION BY grp ORDER BY kth ASC) rn FROM kmv_out) WHERE rn = 1"
    ).collect()
    got = {r["grp"]: (r["n_min"], r["est_distinct"]) for r in out}

    union = spark.createDataFrame(rows1 + rows2, schema)
    want = {r["src"]: (r["n_min"], r["est_distinct"]) for r in
            pipeline.kmv_distinct(union, "src", "val", k=k).collect()}
    assert got == want
    assert got["b"] == (5, 5.0)          # under k ⇒ exact
    assert got["a"][0] == k              # bounded state: exactly k mins kept


def test_streaming_rolling_anomaly_matches_batch(spark, tmp_path):
    """Cross-micro-batch rolling z-score must flag EXACTLY the rows the
    batch window operator flags on the union, when events arrive in time
    order — the (n, Σx, Σx²) state carries the frame across the batch
    boundary. State is bounded at `frame` values per key."""
    import datetime

    from vecgo_spark.streaming.stateful import streaming_rolling_anomaly
    from vecgo_spark.streaming.windows import rolling_anomaly

    base = datetime.datetime(2024, 1, 1)
    schema = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    rows = []
    for i in range(80):
        v = 50.0 + (i % 7)
        if i in (45, 70):
            v = 4000.0                     # planted anomalies (one per batch half)
        rows.append((i, base + datetime.timedelta(minutes=i), 1,
                     "tick" if i % 2 == 0 else "tock", v, "{}"))
    # time-ordered split: batch 1 = first 40 events, batch 2 = rest
    src = str(tmp_path / "anom_src")
    os.makedirs(src)
    spark.createDataFrame(rows[:40], schema).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(rows[40:], schema).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*/")
    )
    q = (
        streaming_rolling_anomaly(stream, frame=30, min_n=10)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["event_id"]: (r["n"], r["is_anomaly"])
           for r in spark.sql("SELECT * FROM anom_out").collect()}
    want = {r["event_id"]: (r["n"], r["is_anomaly"])
            for r in rolling_anomaly(
                spark.createDataFrame(rows, schema), frame=30, min_n=10).collect()}
    assert got == want
    assert want[45][1] and want[70][1]   # both planted spikes flagged
    assert sum(1 for _n, f in want.values() if f) <= 6  # band stays quiet


def test_streaming_ingest_with_incremental_graph_refresh(spark, tmp_path):
    """The ingest → refresh loop a serving deployment runs: micro-batches
    land as segments, refresh_graph_index() indexes ONLY the new ones
    (appended blob dirs, no rebuild), and graph search serves every
    ingested row from blobs — no exact-scan delta leg left behind."""
    import numpy as np

    from vecgo_spark.operators import hnsw
    from vecgo_spark.plans.table import VectorTable
    from vecgo_spark.streaming.ingest import ingest_stream

    rng = np.random.default_rng(41)
    t = VectorTable.create(spark, str(tmp_path / "ting"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(100)],
        "id long, vector array<double>"))
    t.commit()
    t.build_graph_index("hnsw", m=8, ef_construction=64)

    src = str(tmp_path / "ing_src")
    os.makedirs(src)
    probe_a, probe_b = [5.0] * 8, [-5.0] * 8
    spark.createDataFrame([(9000, probe_a)], "id long, vector array<double>")\
        .coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(9001, probe_b)], "id long, vector array<double>")\
        .coalesce(1).write.parquet(src + "/b2")
    stream = (spark.readStream.schema("id long, vector array<double>")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*/"))
    q = ingest_stream(stream, t, str(tmp_path / "ing_ckpt"), assign_ids=False)
    q.awaitTermination(180)

    assert len(t.manifest.segments) == 3  # base + 2 micro-batch flushes
    t.refresh_graph_index()
    info = t.manifest.meta["hnsw"]
    # every flushed segment is blob-indexed; no delta leg remains
    assert {s.path for s in t.manifest.segments} <= set(info["segments"])
    assert len(info["paths"]) == 2  # ONE refresh dir covers both flushes
    assert [r["id"] for r in hnsw.search_at_rest(t, probe_a, k=1).collect()] == [9000]
    assert [r["id"] for r in hnsw.search_at_rest(t, probe_b, k=1).collect()] == [9001]


def test_streaming_ingest_with_incremental_minhash_dedup(spark, tmp_path):
    """The 100-TB ingest-dedup loop end-to-end: an existing corpus with
    MinHash signatures AT REST, micro-batches streaming in, and per batch
    (1) the batch near-dup-checked against STORED corpus signatures —
    batch-sized work, the corpus text never re-shingled — then (2) the
    batch's own signatures folded into the artifact by an incremental
    refresh so the NEXT batch sees it as corpus."""
    from vecgo_spark.operators import dedup
    from vecgo_spark.operators import minhash_at_rest as mar
    from vecgo_spark.plans.table import VectorTable
    from vecgo_spark.streaming.ingest import ingest_stream

    base = "the quick brown fox jumps over the lazy dog by the river"
    t = VectorTable.create(spark, str(tmp_path / "tdup"), dim=None)
    t.insert(spark.createDataFrame(
        [(i, f"{base} corpus{i}") for i in range(1, 21)], "id long, text string"))
    t.commit()
    mar.build_minhash_index(t)

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    # batch 1 carries a near-dup of the corpus; batch 2 a near-dup of
    # BATCH 1 (only findable if the refresh folded batch 1 in)
    spark.createDataFrame([(100, f"{base} corpus1"), (101, "unrelated words x y z q r s t")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(200, "unrelated words x y z q r s t u")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b2")

    hits: dict[int, set[tuple[int, int]]] = {}

    def on_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sigs = mar.stored_minhash_signatures(t)
        pairs = dedup.minhash_dedup_incremental(
            None, batch_df, id_col="id", text_col="text",
            min_matches=8, corpus_sigs=sigs)
        hits[batch_id] = {(r["batch_id"], r["corpus_id"]) for r in pairs.collect()}
        t.insert(batch_df, assign_ids=False)
        t.commit()
        mar.refresh_minhash_index(t)

    stream = (spark.readStream.schema("id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*/"))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "dup_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    assert len(hits) == 2
    first, second = (hits[k] for k in sorted(hits))
    assert (100, 1) in first                      # corpus near-dup found
    assert not any(b == 101 for b, _ in first)    # unrelated doc clean
    assert (200, 101) in second                   # batch-1 doc now corpus
    # every segment indexed: next stored read has no text recompute leg
    info = t.manifest.meta["minhash"]
    assert {s.path for s in t.manifest.segments} <= set(info["segments"])


def test_streaming_ingest_with_simhash_refresh(spark, tmp_path):
    """The simhash family in the ingest loop (the minhash test's twin):
    micro-batches land as segments, refresh_simhash_index() indexes only
    the new ones, and at EVERY batch boundary the stored signatures are
    bit-identical to recomputing simhash over the live snapshot — so a
    stored-sig near-dup pass after any batch equals the recompute pass."""
    from vecgo_spark.operators import dedup
    from vecgo_spark.operators import simhash_at_rest as sar
    from vecgo_spark.plans.table import VectorTable

    base = "the quick brown fox jumps over the lazy dog by the river"
    t = VectorTable.create(spark, str(tmp_path / "tsim"), dim=None)
    t.insert(spark.createDataFrame(
        [(i, f"{base} corpus{i}") for i in range(1, 16)], "id long, text string"))
    t.commit()
    sar.build_simhash_index(t)

    src = str(tmp_path / "sim_src")
    os.makedirs(src)
    spark.createDataFrame([(100, f"{base} corpus1 x")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(200, "completely different words p q r s")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b2")

    seen: dict[int, int] = {}

    def on_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.insert(batch_df, assign_ids=False)
        t.commit()
        sar.refresh_simhash_index(t)
        stored = sorted(map(tuple, sar.stored_simhash_signatures(t)
                            .select("id", "simhash").collect()))
        fresh = sorted(map(tuple, dedup.simhash(
            t.df(), id_col="id", text_col="text")
            .select("id", "simhash").collect()))
        assert stored == fresh, batch_id
        seen[batch_id] = len(stored)

    stream = (spark.readStream.schema("id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*/"))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "sim_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    assert sorted(seen.values()) == [16, 17]
    # every segment indexed: the next stored read has no recompute leg
    info = t.manifest.meta["simhash"]
    assert {s.path for s in t.manifest.segments} <= set(info["segments"])


def test_streaming_ingest_with_lexical_refresh(spark, tmp_path):
    """The serving loop for the PERSISTENT lexical index: micro-batches
    land as segments, refresh_lexical_index() indexes only the new ones,
    and a query issued after each flush finds the batch's documents from
    STORED postings — the reference's write→lexicalIndex.Add→searchable
    contract, with parity against the from-text path at every step."""
    from vecgo_spark.operators import bm25
    from vecgo_spark.operators import lexical_at_rest as lex
    from vecgo_spark.plans.table import VectorTable

    t = VectorTable.create(spark, str(tmp_path / "tlex"), dim=None)
    t.insert(spark.createDataFrame(
        [(i, f"alpha beta common{i % 3} word{i}") for i in range(1, 11)],
        "id long, text string"))
    t.commit()
    t.build_lexical_index()

    src = str(tmp_path / "lex_src")
    os.makedirs(src)
    spark.createDataFrame([(100, "alpha zebra quokka beta")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(200, "zebra zebra gnu")],
                          "id long, text string").coalesce(1).write.parquet(src + "/b2")

    results: dict[int, list] = {}

    def on_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.insert(batch_df, assign_ids=False)
        t.commit()
        t.refresh_lexical_index()
        got = [(r["id"], r["score"]) for r in
               lex.bm25_search_at_rest(t, "zebra beta", k=20).collect()]
        want = [(r["id"], r["score"]) for r in
                bm25.bm25_search(t.df(), "zebra beta", k=20,
                                 id_col="id", text_col="text").collect()]
        assert got == want, batch_id
        results[batch_id] = got

    stream = (spark.readStream.schema("id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*/"))
    q = (stream.writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "lex_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    assert len(results) == 2
    first, second = (results[k] for k in sorted(results))
    assert 100 in {i for i, _ in first}           # batch-1 doc searchable
    assert {100, 200} <= {i for i, _ in second}   # both batches ranked
    # zebra appears twice in doc 200 → it must outrank doc 100
    assert second[0][0] == 200
    info = t.manifest.meta["lexical"]
    assert {s.path for s in t.manifest.segments} <= set(info["segments"])
