"""SimHash signatures at rest (operators/simhash_at_rest.py): lifecycle
(build → reopen → refresh → vacuum → compact), bit-parity of the stored
read path against fresh recompute under tombstones/upserts/delta
segments (incl. the token-less-upsert shadowing edge), banded-pair
serving from stored signatures, and the plan guarantee that fully
indexed reads never touch the text column."""

import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import dedup
from vecgo_spark.operators import simhash_at_rest as sar
from vecgo_spark.plans.table import VectorTable


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, ids, text=None):
    rows = [(i, text if text is not None
             else f"alpha beta gamma tok{i % 7} tok{i % 5} mid{i % 3} end{i % 11}")
            for i in ids]
    return spark.createDataFrame(rows, "id long, text string")


def _sigset(df):
    return sorted(map(tuple, df.collect()))


def _fresh(tbl):
    return dedup.simhash(tbl.df(), "id", "text")


def test_build_and_parity(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 41)))
    tbl.commit()
    v0 = tbl.manifest.version
    assert tbl.build_simhash_index() == v0 + 1
    stored = sar.stored_simhash_signatures(tbl)
    assert stored.columns == ["id", "simhash"]
    assert _sigset(stored) == _sigset(_fresh(tbl))
    # reopen serves stored
    re = VectorTable.open(spark, tdir)
    assert _sigset(sar.stored_simhash_signatures(re)) == _sigset(_fresh(tbl))


def test_delta_tombstone_upsert_parity(spark, tdir):
    """Rows after the build take the recompute delta leg; deletes and
    latest-LSN upserts replay df()'s visibility algebra — including the
    shadowing edge where the upserted text has NO tokens (the stale
    stored signature must NOT resurface)."""
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 41)))
    tbl.commit()
    tbl.build_simhash_index()
    tbl.insert(_docs(spark, range(41, 51)))          # delta segment
    tbl.insert(_docs(spark, [5], text="rewritten entirely different words"))
    tbl.insert(_docs(spark, [6], text="   "))        # token-less upsert
    tbl.commit()
    tbl.delete([7, 8, 44])
    tbl.commit()
    stored = _sigset(sar.stored_simhash_signatures(tbl))
    assert stored == _sigset(_fresh(tbl))
    ids = {r[0] for r in stored}
    assert 5 in ids and 41 in ids
    assert not {6, 7, 8, 44} & ids


def test_reinsert_after_delete_visible(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 11)))
    tbl.commit()
    tbl.build_simhash_index()
    tbl.delete([3])
    tbl.commit()
    tbl.insert(_docs(spark, [3], text="resurrected with brand new token stream"))
    tbl.commit()
    assert _sigset(sar.stored_simhash_signatures(tbl)) == _sigset(_fresh(tbl))


def test_pairs_from_stored_bit_identical(spark, tdir):
    """simhash_pairs(sigs=stored) == simhash_pairs from text, including
    real near-dup matches; bad sig schema rejected."""
    base = "the quick brown fox jumps over the lazy dog by the river bank"
    rows = [(i, f"{base} doc{i}") for i in range(1, 31)]
    rows.append((99, f"{base} doc1 extra"))  # near-dup of doc 1
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(spark.createDataFrame(rows, "id long, text string"))
    tbl.commit()
    tbl.build_simhash_index()
    dedup.release_caches()
    want = _sigset(dedup.simhash_pairs(tbl.df(), id_col="id", text_col="text",
                                       max_hamming=3))
    got = _sigset(dedup.simhash_pairs(
        None, max_hamming=3, sigs=sar.stored_simhash_signatures(tbl)))
    assert got == want and want
    dedup.release_caches()
    with pytest.raises(ValueError, match="sigs must carry"):
        dedup.simhash_pairs(None, sigs=tbl.df())


def test_refresh_vacuum_compact_lifecycle(spark, tdir):
    import os

    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 21)))
    tbl.commit()
    tbl.build_simhash_index()
    v = tbl.manifest.version
    assert tbl.refresh_simhash_index() == v  # no-op
    tbl.insert(_docs(spark, range(21, 31)))
    tbl.commit()
    assert tbl.refresh_simhash_index() > v
    info = tbl.manifest.meta["simhash"]
    assert len(info["paths"]) == 2
    assert _sigset(sar.stored_simhash_signatures(tbl)) == _sigset(_fresh(tbl))
    tbl.vacuum(keep_versions=1)
    assert _sigset(sar.stored_simhash_signatures(tbl)) == _sigset(_fresh(tbl))
    # default compact REBUILDS the family against the new segments
    tbl.delete([2, 3])
    tbl.commit()
    tbl.compact()
    info = tbl.manifest.meta["simhash"]
    assert set(info["segments"]) == {s.path for s in tbl.manifest.segments}
    stored = sar.stored_simhash_signatures(tbl)
    assert _sigset(stored) == _sigset(_fresh(tbl))
    assert not {2, 3} & {r[0] for r in stored.collect()}
    # reindex=False drops it
    tbl.compact(reindex=False)
    assert "simhash" not in tbl.manifest.meta
    with pytest.raises(KeyError, match="simhash"):
        sar.stored_simhash_signatures(tbl)
    out = tbl.vacuum(keep_versions=1)
    assert any("simhash" in f for f in out["removed_files"])


def test_fully_indexed_read_never_touches_text(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 21)))
    tbl.commit()
    tbl.build_simhash_index()
    plan = (sar.stored_simhash_signatures(tbl)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "split(" not in plan
    assert "_text" not in plan and "text#" not in plan


def test_upsert_both_versions_indexed(spark, tdir):
    """Both row versions of an upserted id live in INDEXED segments (the
    build ran after the upsert): the artifact stores a signature row per
    RAW row version, and the read's latest-LSN window must pick the new
    text's signature — including when the newer version is token-less
    (NULL sig shadows, the id drops out entirely)."""
    tbl = VectorTable.create(spark, tdir, dim=None)
    tbl.insert(_docs(spark, range(1, 11)))
    tbl.commit()
    tbl.insert(_docs(spark, [3], text="rewritten with a wholly new token stream"))
    tbl.insert(_docs(spark, [4], text=" \t "))  # token-less version
    tbl.commit()
    tbl.build_simhash_index()  # build AFTER the upserts: all indexed
    assert {s.path for s in tbl.manifest.segments} <= set(
        tbl.manifest.meta["simhash"]["segments"])
    stored = _sigset(sar.stored_simhash_signatures(tbl))
    assert stored == _sigset(_fresh(tbl))
    ids = {r[0] for r in stored}
    assert 3 in ids and 4 not in ids
