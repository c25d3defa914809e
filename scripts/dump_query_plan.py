"""Dump .explain('formatted') of named declared queries to files.

Usage: python scripts/dump_query_plan.py OUTDIR SUFFIX name[,name...] [sf_dir]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

import __spark_entry__ as entrymod  # noqa: E402
from vecgo_spark.session import get_spark  # noqa: E402

spark = get_spark("dump-query-plan")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(outdir, exist_ok=True)
queries = entrymod.queries()
for name in names:
    df = queries[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")
spark.stop()
