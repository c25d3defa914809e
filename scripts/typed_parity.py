"""Driver-mimic typed parity sweep.

Runs every ``queries()`` entry and its ``oracle_sql()`` against the same
sf directory and compares (a) row counts, (b) sorted column names,
(c) order-insensitive values, and (d) the *arrow-level types* of each
column — the driver's value hash is type-sensitive (round 1's
knn_bq_hamming failed on BIGINT vs HUGEINT with identical values), so a
Python-value comparison alone is not enough.

Usage: python scripts/typed_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

from tests.oracle_harness import compare, duck_connection
from vecgo_spark.session import get_spark


def _canon_type(t: pa.DataType) -> str:
    """Collapse arrow types to the driver-relevant equivalence classes."""
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = get_spark()
    con = duck_connection(sf_dir)
    qs = entry.queries()
    oracles = entry.oracle_sql()

    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {"value_match": None, "type_match": None, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            ok, msg = compare(sdf, oracles[name], con)
            rec["value_match"] = ok
            if not ok:
                rec["err"] = msg[:400]
            # typed comparison
            s_arrow = sdf.toArrow()
            d_arrow = con.execute(oracles[name]).arrow()
            s_types = {f.name: _canon_type(f.type) for f in s_arrow.schema}
            d_types = {f.name: _canon_type(f.type) for f in d_arrow.schema}
            mismatches = {
                c: (s_types.get(c), d_types.get(c))
                for c in set(s_types) | set(d_types)
                if s_types.get(c) != d_types.get(c)
            }
            rec["type_match"] = not mismatches
            if mismatches:
                rec["type_mismatches"] = {k: list(v) for k, v in mismatches.items()}
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        if not (rec["value_match"] and rec["type_match"]):
            n_fail += 1
            print(f"FAIL {name}: {json.dumps(rec)}", flush=True)
        else:
            print(f"ok   {name}", flush=True)
        results[name] = rec

    print(json.dumps({"total": len(results), "fail": n_fail}))
    with open("/tmp/typed_parity.json", "w") as f:
        json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
