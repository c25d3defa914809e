"""As-of (time-series point-in-time) join.

Beyond the reference's surface (vecgo has no temporal operators at all —
SURVEY §2.3/§2.10); listed in the north-star training-pipeline family as a
custom operator Spark lacks natively.

Semantics: for every left row, attach the payload of the single right row
with the same key whose timestamp is the greatest one ≤ (inclusive) or <
(strict) the left row's timestamp. Ties inside the right side resolve to
the row latest in (ts, tiebreak...) order — fully deterministic.

Scale design — the union+window formulation, NOT a range join:
  * one shuffle, partitioned by the join key (the same shuffle a groupBy
    on the key would pay); per-partition work is a sort + linear scan.
  * a naive `left.join(right, key).where(r.ts <= l.ts)` + argmax builds
    O(|L|·|R|) intermediate rows per key before cutting them back down;
    the union+window never materializes more than |L|+|R| rows.
  * the right payload rides as ONE struct column, so every attached field
    comes from the SAME matched right row even when some fields are NULL
    (per-column `last(..., ignorenulls=True)` would mix rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    inclusive: bool = True,
    tiebreak_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + `prefix`-renamed payload of its
    most recent right match (NULL payload when no right row precedes it).

    ``tiebreak_cols`` must exist on the right side; they order right rows
    that share (key, ts) so the match is deterministic (last in order
    wins). Left rows keep all their columns.
    """
    key_cols = list(key_cols)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak_cols],
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l = left.withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # Order inside each key: by ts, then side. Inclusive → right rows at
    # an equal ts sort BEFORE the left row (frame "up to 1 preceding"
    # includes them); strict → after (excluded). Right-vs-right ties
    # resolve by tiebreak_cols ascending (last = greatest wins).
    side_order = F.col(_SIDE).asc() if inclusive else F.col(_SIDE).desc()
    order = [F.col(ts_col).asc(), side_order] + [
        F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreak_cols
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).where(F.col(_SIDE) == 1)
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("__m").getField(c))
    drop = [_SIDE, _PAYLOAD, "__m"] + [f"__tb_{c}" for c in tiebreak_cols]
    return out.drop(*drop)
