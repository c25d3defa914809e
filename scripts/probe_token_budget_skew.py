"""Probe for the round-7 "token_budget_mixture one task per source"
finding and the round-8 two-phase fix.

Setup: ONE source of N short documents — the mega-source shape a real
mixture always has.  The old plan ran the running token sum as a single
window partition (`Window.partitionBy(source)`), so the entire source
sorted and summed inside ONE task regardless of cluster size.  The
two-phase plan (pipeline.token_budget_mixture) splits the source into
2^bucket_bits deterministic range buckets from the priority hash's top
bits, aggregates per-bucket subtotals, and broadcasts exclusive offsets
back — the same result (asserted below), spread over many tasks.

What local[8] can and cannot show: wall times here are similar (the
whole box is 8 cores, and the two-phase plan pays a second aggregation
pass), so the probe reports the STRUCTURAL bound instead — the largest
single window group, i.e. the number of rows that must flow through one
task no matter how many executors exist.  Old plan: the whole source
(grows with the corpus, unbounded).  Two-phase: the largest hash bucket
(~N/2^bucket_bits, tunable).  On a 1000-executor cluster the old plan
pins the full cumsum on one core while 999 idle — and one task must
sort-buffer (spill) the entire source.

Run: PYTHONPATH=. python scripts/probe_token_budget_skew.py [n_docs]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

from vecgo_spark.functions.hashing import stable_hash64
from vecgo_spark.operators import pipeline
from vecgo_spark.operators.bm25 import tokenize_expr

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("source"),
        F.concat(F.lit("alpha beta gamma doc "), F.col("id").cast("string"))
        .alias("text"),
    )
)
docs.count()  # warm the session
BUDGETS = {"web": 10 * N}  # admit everything: worst case, full cumsum needed


def old_single_window(d):
    """The r7 plan: one window partition per source."""
    sel = d.select(
        "doc_id",
        F.col("source"),
        F.size(tokenize_expr("text")).cast("long").alias("n_tokens"),
        stable_hash64(F.col("doc_id").cast("string"), seed=0).alias("_pri"),
        F.lit(int(BUDGETS["web"])).cast("long").alias("_budget"),
    )
    w = (
        Window.partitionBy("source").orderBy("_pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sel.select("doc_id", "source", "n_tokens",
                   F.sum("n_tokens").over(w).alias("cum_tokens"), "_budget")
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .drop("_budget")
    )


def timed(label, df):
    t0 = time.time()
    agg = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("cum_tokens")).alias("s")).collect()[0]
    dt = time.time() - t0
    print(f"{label:20s} {dt:7.2f}s   rows={agg['n']}  sum(cum)={agg['s']}")
    return dt, (agg["n"], agg["s"])


print(f"N = {N} docs, one source, budget admits all")
t_new, r_new = timed("two-phase (r8)", pipeline.token_budget_mixture(docs, BUDGETS))
t_old, r_old = timed("single-window (r7)", old_single_window(docs))
assert r_new == r_old, (r_new, r_old)
print(f"identical results; wall single-window/two-phase = {t_old / t_new:.2f}x "
      f"(local[8]; wall parity expected — 8 cores can't show a 1000-core win)")

# the structural bound: rows forced through ONE window task
bucketed = docs.select(
    stable_hash64(F.col("doc_id").cast("string"), seed=0).alias("_pri")
).select(F.shiftright("_pri", 60 - 12).alias("_bk"))
max_bucket = bucketed.groupBy("_bk").count().agg(F.max("count")).collect()[0][0]
print(f"largest single window group: single-window = {N} rows (the whole "
      f"source, one task, unbounded); two-phase = {max_bucket} rows "
      f"(~N/4096, bucket_bits-tunable) — {N // max_bucket}x more parallelism "
      f"and no source-sized sort buffer in any task")
spark.stop()
