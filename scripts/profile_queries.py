"""Per-query profiling: split driver-side build time vs execution, count
Exchange/Python-eval nodes, and time a repeat execution (steady state)."""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

import __spark_entry__ as entrymod
from vecgo_spark.session import get_spark

TARGETS = sys.argv[1].split(",") if len(sys.argv) > 1 else None

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("vecgo-profile")
spark.sparkContext.setLogLevel("ERROR")

queries = entrymod.queries()
names = TARGETS or list(queries)

# warm-up exactly like bench.py
entrymod.entry(spark).collect()
for fn in (entrymod._at_rest_table, entrymod._at_rest_opq_table):
    try:
        fn(spark, sf_dir)
    except Exception:
        pass
for _name, _fn in queries.items():
    try:
        _fn(spark, sf_dir).count()
    except Exception:
        pass

rows = []
for name in names:
    fn = queries[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)          # build: entry-side driver work + plan construction
    t1 = time.perf_counter()
    plan = df._jdf.queryExecution().executedPlan().toString()  # forces analysis+physical planning
    t2 = time.perf_counter()
    b0 = time.perf_counter()
    df2 = fn(spark, sf_dir)
    c0 = time.perf_counter()
    df2.count()                     # fresh build + exec, like bench
    c1 = time.perf_counter()
    df3 = fn(spark, sf_dir)
    c2 = time.perf_counter()
    df3.count()
    c3 = time.perf_counter()
    build2 = (c0 - b0) + (c2 - c1)
    n_exch = plan.count("Exchange")
    n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas") + plan.count("InArrow")
    n_bc = plan.count("BroadcastExchange")
    rows.append({
        "name": name,
        "build_s": round(t1 - t0, 3),
        "plan_s": round(t2 - t1, 3),
        "exec1_s": round(c1 - c0, 3),
        "exec2_s": round(c3 - c2, 3),
        "rebuild_avg_s": round(build2 / 2, 3),
        "exchanges": n_exch - n_bc,
        "bcast": n_bc,
        "py_nodes": n_py,
        "plan_chars": len(plan),
    })
    print(json.dumps(rows[-1]), flush=True)

with open("/tmp/profile_out.json", "w") as fh:
    json.dump(rows, fh, indent=1)
spark.stop()
