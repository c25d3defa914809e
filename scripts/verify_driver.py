"""Driver-mimic verification: exercises the public contract exactly as the
external driver does — fresh SparkSession, entry() smoke, every queries()
entry vs its oracle_sql() via DuckDB at the given sf dir.

Usage: python scripts/verify_driver.py [sf_dir] [--only substr,substr...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

ONLY: list[str] = []
if "--only" in sys.argv:
    i = sys.argv.index("--only")
    if i + 1 >= len(sys.argv):
        raise SystemExit("usage: verify_driver.py [sf_dir] --only substr[,substr...]")
    ONLY = sys.argv[i + 1].split(",")
    del sys.argv[i : i + 2]

if len(sys.argv) > 1:
    # oracle_sql() trains ANN artifacts from parquet; point it at the same
    # sf dir the queries run at (the external driver always uses sf0.01,
    # which is the module default)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sys.argv[1])

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402
from vecgo_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("verify-driver")
    spark.sparkContext.setLogLevel("ERROR")

    if not ONLY:
        df = entrymod.entry(spark)
        rows = df.collect()
        print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")

    queries = entrymod.queries()
    if ONLY:
        queries = {k: v for k, v in queries.items()
                   if any(s in k for s in ONLY)}
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    failed = []
    for name, fn in queries.items():
        try:
            qdf = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(qdf, oracles[name], con)
                status = "MATCH" if ok else f"MISMATCH: {msg}"
                if not ok:
                    failed.append(name)
            else:
                n = qdf.count()
                status = f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"ERROR: {e}"
            failed.append(name)
        print(f"  {name}: {status}")

    print(f"{len(queries) - len(failed)}/{len(queries)} queries OK at {sf_dir}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
