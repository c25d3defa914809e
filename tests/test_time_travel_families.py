"""Time travel × at-rest index families: open(version=v) must serve
every family read from THAT version's meta — the artifacts the v
manifest references, the v segment set, the v visibility state — even
after later writes, refreshes and compact(reindex=True) rebuilt the
families; it must refuse cleanly when the family postdates v (the meta
simply has no entry yet, the reference's versioned-manifest stance);
and vacuum honors versioned artifact refs: kept versions pin their
dirs, collected versions release them."""

import os

import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import bm25, dedup
from vecgo_spark.operators import lexical_at_rest as lex
from vecgo_spark.operators import minhash_at_rest as mar
from vecgo_spark.plans.table import VectorTable


def _docs(spark, ids):
    rows = [(i, f"alpha beta tok{i % 5} gamma end{i % 7}") for i in ids]
    return spark.createDataFrame(rows, "id long, text string")


def _res(df):
    return [tuple(r) for r in df.collect()]


Q = "beta tok3"


def _churn_and_rebuild(tbl, spark):
    """Writes + delete + full compaction (rebuilds every family into new
    dirs) — everything a pinned old version must NOT see."""
    tbl.insert(_docs(spark, range(100, 131)))
    tbl.commit()
    tbl.refresh_lexical_index()
    tbl.delete([2, 101])
    tbl.commit()
    tbl.compact(reindex=True)


def test_open_version_serves_old_lexical_bit_identically(spark, tmp_path):
    path = str(tmp_path / "tbl")
    tbl = VectorTable.create(spark, path, dim=None)
    tbl.insert(_docs(spark, range(1, 31)))
    tbl.commit()
    tbl.build_lexical_index()
    v_lex = tbl.manifest.version
    want_old = _res(lex.bm25_search_at_rest(tbl, Q, k=10))
    old_info = tbl.manifest.meta["lexical"]

    _churn_and_rebuild(tbl, spark)
    assert tbl.manifest.meta["lexical"]["path"] != old_info["path"]
    now = _res(lex.bm25_search_at_rest(tbl, Q, k=10))
    assert now != want_old  # the live table moved on

    old = VectorTable.open(spark, path, version=v_lex)
    assert old.manifest.meta["lexical"]["path"] == old_info["path"]
    got = _res(lex.bm25_search_at_rest(old, Q, k=10))
    assert got == want_old
    # and bit-identical to recomputing over the OLD snapshot's text
    assert got == _res(bm25.bm25_search(old.df(), Q, k=10,
                                        id_col="id", text_col="text"))
    # corpus counters come from the OLD manifest (clean snapshot at v)
    n, total = lex.corpus_counts(old)
    assert n == 30
    # pinned tables are read-only: index maintenance refuses
    with pytest.raises(RuntimeError, match="read-only"):
        old.refresh_lexical_index()
    with pytest.raises(RuntimeError, match="read-only"):
        old.build_lexical_index()


def test_family_postdating_version_refuses_cleanly(spark, tmp_path):
    path = str(tmp_path / "tbl")
    tbl = VectorTable.create(spark, path, dim=None)
    tbl.insert(_docs(spark, range(1, 21)))
    tbl.commit()
    v_pre = tbl.manifest.version
    tbl.build_lexical_index()
    tbl.build_minhash_index()

    old = VectorTable.open(spark, path, version=v_pre)
    with pytest.raises(KeyError, match="no lexical index"):
        lex.bm25_search_at_rest(old, Q, k=5)
    with pytest.raises(KeyError):
        mar.stored_minhash_signatures(old)
    # the table FRONT degrades gracefully: no family at v ⇒ recompute
    got = _res(old.bm25_search(Q, k=5))
    assert got == _res(bm25.bm25_search(old.df(), Q, k=5,
                                        id_col="id", text_col="text"))
    assert got


def test_open_version_serves_old_minhash_and_graph(spark, tmp_path):
    import numpy as np

    path = str(tmp_path / "tbl")
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist(),
             f"alpha beta tok{i % 5} gamma end{i % 7}") for i in range(1, 41)]
    tbl = VectorTable.create(spark, path, dim=8, metric="l2")
    tbl.insert(spark.createDataFrame(
        rows, "id long, vector array<double>, text string"))
    tbl.commit()
    tbl.build_minhash_index()
    tbl.build_graph_index("hnsw")
    v_old = tbl.manifest.version
    sig_old = {r["id"] for r in mar.stored_minhash_signatures(tbl).collect()}
    q = rows[5][1]
    graph_old = _res(tbl.graph_search(q, k=5))

    more = [(i, rng.standard_normal(8).tolist(), f"zeta eta tok{i % 5}")
            for i in range(100, 121)]
    tbl.insert(spark.createDataFrame(
        more, "id long, vector array<double>, text string"))
    tbl.commit()
    tbl.compact(reindex=True)
    assert {r["id"] for r in mar.stored_minhash_signatures(tbl).collect()} \
        > sig_old

    old = VectorTable.open(spark, path, version=v_old)
    got_sigs = mar.stored_minhash_signatures(old)
    assert {r["id"] for r in got_sigs.collect()} == sig_old
    # stored == recompute over the old snapshot, column for column
    fresh = dedup.minhash_signatures(old.df(), "id", "text")
    assert sorted(map(tuple, got_sigs.collect())) == \
        sorted(map(tuple, fresh.collect()))
    # graph family: the old version's blobs serve; new ids never surface
    got_graph = _res(old.graph_search(q, k=5))
    assert got_graph == graph_old
    assert all(i < 100 for i, _ in got_graph)


def test_vacuum_respects_versioned_artifact_refs(spark, tmp_path):
    path = str(tmp_path / "tbl")
    tbl = VectorTable.create(spark, path, dim=None)
    tbl.insert(_docs(spark, range(1, 21)))
    tbl.commit()
    tbl.build_lexical_index()
    v_lex = tbl.manifest.version
    old_rel = tbl.manifest.meta["lexical"]["path"]
    want_old = _res(lex.bm25_search_at_rest(tbl, Q, k=10))

    _churn_and_rebuild(tbl, spark)
    n_keep = len(tbl.versions()) - v_lex + 1  # keep back to v_lex

    tbl.vacuum(keep_versions=n_keep)
    # v_lex is kept ⇒ its postings dir AND df sidecar survive, and the
    # pinned read still serves bit-identically
    assert os.path.exists(os.path.join(path, old_rel))
    assert os.path.exists(os.path.join(path, lex.df_dir(old_rel)))
    old = VectorTable.open(spark, path, version=v_lex)
    assert _res(lex.bm25_search_at_rest(old, Q, k=10)) == want_old

    removed = tbl.vacuum(keep_versions=1)
    # v_lex dropped ⇒ the superseded dirs are collected (sidecar too)
    assert not os.path.exists(os.path.join(path, old_rel))
    assert not os.path.exists(os.path.join(path, lex.df_dir(old_rel)))
    assert old_rel in removed["removed_files"]
    with pytest.raises(Exception):
        VectorTable.open(spark, path, version=v_lex)
    # the live family still serves after GC
    assert lex.bm25_search_at_rest(tbl, Q, k=5).count() > 0
