"""A/B harness for the r13-verdict text-family drift question (What's
wrong #2): time a small query cohort best-of-N with host-health proof
(gemm GFLOPS calibration + CPU steal) attached, so two runs from
different checkouts are comparable — run it from HEAD and from a
worktree of an older round and diff the JSON lines.

Usage:
    python scripts/ab_drift.py [--sf DIR] [--passes N] [--queries a,b,c]

Self-contained on purpose: older rounds' bench.py predates the
host_health field, so this script carries its own gemm/steal
measurement instead of importing from bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

COHORT = ["kmv_distinct_shingles", "docs_dsir_weights",
          "docs_tfidf_keywords", "doc_perplexity_bigram",
          "docs_weighted_sample"]


def _gemm_gflops() -> float:
    """Best-of-5 1024^3 matmul (square matmuls are stable on this host;
    thin-k ones swing 60x — the r13 calibration lesson)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1024, 1024))
    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        (a @ a).sum()
        dt = time.perf_counter() - t0
        best = max(best, 2.0 * 1024**3 / dt / 1e9)
    return round(best, 1)


def _read_cpu_stat():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0, 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = 2
    names = list(COHORT)
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--passes":
            passes = int(args.pop(0))
        elif a == "--queries":
            names = args.pop(0).split(",")
        else:
            raise SystemExit(f"unknown arg {a}")

    import __spark_entry__ as entrymod
    from vecgo_spark.session import get_spark

    spark = get_spark("ab-drift")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    stat0 = _read_cpu_stat()
    gemm = _gemm_gflops()
    # warm-up (JIT/codegen/page cache), untimed
    for n in names:
        queries[n](spark, sf_dir).count()
    timings: dict[str, float] = {}
    pass_totals = []
    for _ in range(passes):
        total = 0.0
        for n in names:
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            total += dt
            timings[n] = min(timings.get(n, float("inf")), dt)
        pass_totals.append(round(total, 3))
    stat1 = _read_cpu_stat()
    dtotal = stat1[0] - stat0[0]
    steal = round(100.0 * (stat1[1] - stat0[1]) / dtotal, 2) if dtotal else None

    head = os.popen("git rev-parse --short HEAD 2>/dev/null").read().strip()
    print(json.dumps({
        "rev": head, "sf_dir": sf_dir,
        "host_health": {"gemm_gflops": gemm, "cpu_steal_pct": steal},
        "pass_totals": pass_totals,
        "queries": {n: round(v, 3) for n, v in timings.items()},
        "total_best": round(sum(timings.values()), 3),
    }))


if __name__ == "__main__":
    main()
