"""Per-query recall@10 for the three rows-only (approximate) ANN suites.

The driver's correctness harness can only row-count these (HNSW/Vamana are
RNG-seeded approximate structures with no SQL twin), so this script tracks
the QUALITY signal the hash check can't: for each of the 5 batch queries
(vec_id < 5), recall@10 against the exact L2 top-10 computed by brute
force on the same parquet.

Run: PYTHONPATH=. python scripts/recall_report.py [sf_dir]
Paste the table into COVERAGE.md §2.9 each round.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from vecgo_spark.functions import vector as vfn  # noqa: E402
from vecgo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = e.load_table(spark, sf_dir, "embeddings")

    # exact per-query L2 top-10 (the ground truth all three suites chase)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    from pyspark.sql.window import Window

    scored = emb.crossJoin(F.broadcast(queries)).select(
        "qid", "vec_id", vfn.sq_l2("embedding", F.col("qv")).alias("d"))
    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("vec_id").asc())
    exact = {
        qid: set(r["vec_id"] for r in rows)
        for qid, rows in _group(
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 10).select("qid", "vec_id").collect())
    }

    qs = e.queries()
    print(f"recall@10 vs exact L2, {sf_dir} (5 queries):")
    print("| query | per-qid recall | mean |")
    print("|---|---|---|")
    for name in ["ann_hnsw_batch", "ann_hnsw_at_rest", "ann_vamana_at_rest"]:
        df = qs[name](spark, sf_dir)
        qcol = "qid" if "qid" in df.columns else None
        rows = df.collect()
        if qcol is None:
            # single-query suites return (vec_id, score) for qid 0
            got = {0: {r["vec_id"] for r in rows}}
        else:
            got = {}
            for r in rows:
                got.setdefault(r[qcol], set()).add(r["vec_id"])
        recs = {q: len(got.get(q, set()) & exact[q]) / len(exact[q])
                for q in sorted(exact) if q in got or qcol is not None}
        if not recs:
            recs = {0: len(got[0] & exact[0]) / len(exact[0])}
        mean = sum(recs.values()) / len(recs)
        per = " ".join(f"q{q}={v:.2f}" for q, v in sorted(recs.items()))
        print(f"| {name} | {per} | {mean:.3f} |")
    spark.stop()


def _group(rows):
    by = {}
    for r in rows:
        by.setdefault(r["qid"], []).append(r)
    return by.items()


if __name__ == "__main__":
    main()
