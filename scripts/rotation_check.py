"""Driver-window rotation audit — the standing policy from the round-4
verdict: the external driver oracle-checks only the FIRST 50 queries()
entries, so driver evidence goes stale for whatever sits in the tail.
This script reports, per query, the freshest round with a fully-green
driver row (rows+schema+hash) and flags the window/tail placement that
the NEXT round's rotation should fix:

  * stale-in-tail: oracle-checked queries in the tail whose evidence is
    older than the newest round (candidates to rotate IN, oldest first)
  * never-checked: oracle-checked queries with no driver row in any round
    (highest priority for the window)
  * fresh-in-window: window entries that already have a current-round
    green row (candidates to rotate OUT — except the canary families)

Usage: python scripts/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r12 policy: a reduced SENTINEL set — one representative per
# historically-fragile family (events windowing, at-rest fixtures) stays
# pinned in the window; the rest of those families rotate normally under
# window pressure (they broke together when driver testdata regenerated,
# so one sentinel per family catches the class).
CANARY_PREFIXES = ("events_tumbling_1h", "events_sessionization",
                   "ann_ivf_at_rest", "ann_ivf_opq_at_rest")


def main() -> int:
    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    evidence: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnd)
        d = json.load(open(path))
        for name, row in d.items():
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match") and not row.get("err")):
                evidence[name] = max(evidence.get(name, 0), rnd)
    newest = max(rounds) if rounds else 0
    keys = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window, tail = keys[:50], keys[50:]

    stale_tail = sorted((q for q in tail if q in oracles
                         and evidence.get(q, 0) < newest),
                        key=lambda q: evidence.get(q, 0))
    never = [q for q in keys if q in oracles and q not in evidence]
    fresh_window = [q for q in window if evidence.get(q, 0) == newest
                    and not q.startswith(CANARY_PREFIXES)]

    print(f"rounds seen: {rounds} (newest r{newest}); "
          f"{len(keys)} queries = {len(oracles)} oracle + "
          f"{len(keys) - len(oracles)} rows-only")
    print(f"\nnever driver-checked ({len(never)}) — rotate IN first:")
    for q in never:
        print(f"  {q}")
    print(f"\nstale-in-tail ({len(stale_tail)}) — oldest evidence first:")
    for q in stale_tail:
        print(f"  {q} (r{evidence.get(q, 0)})")
    print(f"\nfresh-in-window non-canary ({len(fresh_window)}) — rotate OUT "
          "candidates:")
    for q in fresh_window:
        print(f"  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
