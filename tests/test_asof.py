"""As-of join: union+window implementation vs a brute-force
join-then-argmax oracle, on adversarial tiny data (equal timestamps,
keys with no match, NULL payload fields, multi-candidate ties)."""

import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators.asof import asof_join

LEFT = [
    # (event_id, key, ts)
    (1, "a", 10),
    (2, "a", 20),
    (3, "a", 20),   # same key+ts as event 2
    (4, "b", 5),    # before every right row for b
    (5, "b", 30),
    (6, "c", 50),   # key with no right rows at all
]
RIGHT = [
    # (rid, key, ts, payload_x)
    (100, "a", 10, 1.5),   # ts ties LEFT event 1
    (101, "a", 10, None),  # same key+ts as 100 — tie inside right side
    (102, "a", 15, 2.5),
    (103, "b", 30, 3.5),   # ts ties LEFT event 5
]


def _brute(inclusive: bool):
    out = {}
    for eid, k, ts in LEFT:
        cands = [
            r for r in RIGHT
            if r[1] == k and (r[2] <= ts if inclusive else r[2] < ts)
        ]
        if cands:
            best = max(cands, key=lambda r: (r[2], r[0]))  # latest ts, then rid
            out[eid] = (best[0], best[3])
        else:
            out[eid] = (None, None)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(LEFT, "event_id long, key string, ts long")
    right = spark.createDataFrame(RIGHT, "rid long, key string, ts long, x double")
    return left, right


@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_matches_bruteforce(frames, inclusive):
    left, right = frames
    got = asof_join(
        left, right, key_cols=["key"], ts_col="ts",
        payload_cols=["rid", "x"], inclusive=inclusive,
        tiebreak_cols=["rid"],
    ).orderBy("event_id").collect()
    expect = _brute(inclusive)
    assert len(got) == len(LEFT)
    for r in got:
        assert (r["asof_rid"], r["asof_x"]) == expect[r["event_id"]], (
            r["event_id"], inclusive)


def test_asof_payload_fields_come_from_same_row(frames):
    """Right row 101 (x=NULL) is the latest match for left ts=10 inclusive:
    rid must be 101 AND x must be NULL — not x back-filled from row 100."""
    left, right = frames
    got = {
        r["event_id"]: (r["asof_rid"], r["asof_x"])
        for r in asof_join(
            left, right, ["key"], "ts", ["rid", "x"],
            inclusive=True, tiebreak_cols=["rid"],
        ).collect()
    }
    assert got[1] == (101, None)


def test_asof_keeps_left_columns_and_count(frames):
    left, right = frames
    out = asof_join(left, right, ["key"], "ts", ["rid"], tiebreak_cols=["rid"])
    assert set(out.columns) == {"event_id", "key", "ts", "asof_rid"}
    assert out.count() == len(LEFT)


def test_asof_single_shuffle_plan(frames):
    """The plan must contain exactly one exchange (the key partition) —
    no join at all, so no O(|L|·|R|) risk."""
    left, right = frames
    out = asof_join(left, right, ["key"], "ts", ["rid"], tiebreak_cols=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # key hashpartition (+AQE variant)
