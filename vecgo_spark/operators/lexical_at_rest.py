"""BM25 lexical index AT REST — the reference's `lexical.Index` is
PERSISTENT (Add maintains postings/counters on every insert,
lexical/bm25/bm25.go:29-53,180-229; the engine wires every write through
lexicalIndex.Add, engine.go insert path), while the plain `operators/
bm25.py` path re-derives corpus statistics from text per query. This
module closes that parity gap with the same lifecycle the minhash /
graph families use (operators/minhash_at_rest.py shape):

  build:    per RAW segment row version → one POSTING row per distinct
            term (id, _lsn, _seg, term, tf, dl) plus one MARKER row per
            doc version (term NULL, tf 0, dl = token count — zero-token
            docs still count toward N and avgdl, bm25.go Add), written
            sorted by term so a query's `term IN (...)` prunes parquet
            row groups like a postings lookup; per-segment (docs,
            total_len) counters land in the manifest meta — the
            reference's running N/Σdl.
  refresh:  new segments get their own dir (immutable existing dirs,
            fold at the max_dirs cap) via the shared
            graph_at_rest.refresh_family_dirs core; counters ride the
            same manifest publish through info_update.
  read:     stored rows of live indexed segments ∪ a recompute delta leg
            for unindexed segments, then EXACTLY df()'s visibility
            algebra (size-gated tombstone anti-join + latest-LSN-wins
            upsert filter) replayed on the index rows — so
            `bm25_search_at_rest` is BIT-IDENTICAL to running
            `bm25.bm25_search` over `tbl.df()`: integer tf/dl/df/N feed
            the same literal-idf fixed-order score expression.
            include_pending=True extends the delta leg to staged
            (uncommitted) segments and flips the visibility legs to the
            read-your-writes view — parity target becomes
            `tbl.df(include_pending=True)` (r12 verdict #2; the
            reference's insert-immediately-searchable lexicalIndex.Add,
            engine.go:833-921).
  compact / full compaction rebuilds the family (table.compact reindex);
  vacuum:   dirs are referenced via meta["lexical"] paths.

Scale posture: per-query reads touch |query terms| postings (row-group
pruned) ONCE — per-term docFreq comes from stored per-segment df
sidecars on clean snapshots (bm25.go:29-53's running docFreq; a
|terms|-row lookup) and from a persisted shared candidate frame under
churn — plus either the manifest counters (clean snapshot: zero-job
N/Σdl, the engine-stats stance of count()) or one narrow marker scan
(tombstones/upserts in play — per-doc dl is genuinely required for
N/Σdl); the corpus text column is never touched for indexed segments.
Under upserts the per-id winning LSN comes from the table's CACHED
persisted PK-index frame (table._vis_vmax — the same structure the
vector read path consults; one visibility mechanism for both paths,
exactly the reference's single loaded PK index, internal/pk/mvcc.go:125
consulted by search.go:1092-1105 and engine.go:1617-1632), NOT from
re-aggregating this family's marker rows.
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vecgo_spark.operators.bm25 import B, K1, tokenize_expr, tokenize_py

FAMILY = "lexical"


def _segment_rows(tbl, segs, text_col: str) -> DataFrame:
    """(id, _lsn, _seg, term, tf, dl) posting + marker rows for every RAW
    row version of `segs` (markers keep shadowed/zero-token versions
    visible to the upsert algebra, the minhash NULL-sig stance)."""
    from vecgo_spark.functions.hashing import eval_once
    from vecgo_spark.operators.graph_at_rest import seg_tag_expr

    base = tbl._segment_df(segs).select(
        F.col(tbl.id_col).alias("id"), F.col("_lsn"),
        eval_once(tokenize_expr(text_col)).alias("toks"),
    ).withColumn("_seg", seg_tag_expr()).withColumn(
        "dl", F.size("toks").cast("long"))
    postings = (
        base.select("id", "_lsn", "_seg", "dl", F.explode("toks").alias("term"))
        .groupBy("id", "_lsn", "_seg", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    markers = base.select(
        "id", "_lsn", "_seg", "dl",
        F.lit(None).cast("string").alias("term"), F.lit(0).cast("long").alias("tf"))
    cols = ["id", "_lsn", "_seg", "term", "tf", "dl"]
    return postings.select(*cols).unionByName(markers.select(*cols))


def df_dir(rel: str) -> str:
    """Sidecar per-term docFreq dir for a postings dir — BY CONVENTION at
    `<postings-dir>-df` so refresh_family_dirs' single-path contract
    stays untouched (vacuum and the reader both derive it)."""
    return rel + "-df"


def _write_lex_dir(tbl, segs, version: int, text_col: str, extra=None) -> str:
    from vecgo_spark.plans.manifest import fs_exists, fs_rmtree
    from vecgo_spark.plans.table import INDEX_DIR

    rel = os.path.join(INDEX_DIR, f"{FAMILY}-v{version:08d}")
    full = os.path.join(tbl.path, rel)
    for p in (full, os.path.join(tbl.path, df_dir(rel))):
        if fs_exists(p):
            fs_rmtree(p)  # orphan of a failed earlier attempt
    out = _segment_rows(tbl, segs, text_col)
    if extra is not None:
        out = out.unionByName(extra.select(*out.columns))
    # range-partition + sort by term → each FILE covers a narrow,
    # near-disjoint term range and row groups are term-clustered inside
    # it, so a query's `term IN (...)` prunes at both granularities —
    # the postings-lookup analog (markers sort as NULLs into the first
    # range; the N/Σdl marker scan reads only those files)
    (out.repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("error").parquet(full))
    # per-(segment, term) docFreq sidecar — the reference's running
    # docFreq counter (bm25.go:29-53 keeps df per term on every Add).
    # Derived from the WRITTEN rows (one posting row per (id, version,
    # term)), so on a clean snapshot Σ_seg df == true per-term df and
    # the query-time df aggregate over candidates disappears. Term-sorted
    # for the same row-group pruning as the postings.
    written = tbl.spark.read.parquet(full)
    (written.where(F.col("term").isNotNull())
        .groupBy("_seg", "term").agg(F.count(F.lit(1)).alias("df"))
        .repartitionByRange(F.col("term"))
        .sortWithinPartitions("term")
        .write.mode("error").parquet(os.path.join(tbl.path, df_dir(rel))))
    return rel


def _seg_counts(tbl, segs, text_col: str) -> dict:
    """{seg_path: {"docs": n, "len": Σdl}} — the reference's running
    docCount/totalLength, per segment so folds/compactions stay exact."""
    from vecgo_spark.operators.graph_at_rest import seg_tag_expr

    rows = (
        tbl._segment_df(segs)
        .select(F.col(tbl.id_col).alias("id"),
                tokenize_expr(text_col).alias("toks"))
        .withColumn("_seg", seg_tag_expr())
        .groupBy("_seg")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum(F.size("toks")).alias("len"))
        .collect()
    )
    return {r["_seg"]: {"docs": int(r["docs"]), "len": int(r["len"] or 0)}
            for r in rows}


def build_lexical_index(tbl, text_col: str = "text") -> int:
    """Index every committed segment; publish a manifest version with
    {path, segments, text_col, seg_counts}."""
    from vecgo_spark.plans.manifest import Manifest, save_manifest

    tbl._check_writable()
    man = tbl.manifest
    if not man.segments:
        raise ValueError("nothing to index: table has no committed segments")
    version = man.version + 1
    rel = _write_lex_dir(tbl, man.segments, version, text_col)
    info = {
        "path": rel, "segments": [s.path for s in man.segments],
        "text_col": text_col,
        "seg_counts": _seg_counts(tbl, man.segments, text_col),
    }
    from vecgo_spark.operators.graph_at_rest import record_dir_bytes
    record_dir_bytes(tbl, info)
    new = Manifest(
        version=version, lsn=man.lsn, next_id=man.next_id,
        created_at=time.time(), segments=list(man.segments),
        tombstone_files=list(man.tombstone_files),
        meta={**man.meta, FAMILY: info},
        tombstone_stats=dict(man.tombstone_stats),
    )
    save_manifest(tbl.path, new)
    tbl.manifest = new
    return version


def refresh_lexical_index(tbl, max_dirs: int = 8) -> int:
    """Index segments committed after the last build/refresh (shared
    refresh/fold core); per-segment counters ride the same publish."""
    from vecgo_spark.operators.graph_at_rest import refresh_family_dirs

    info = tbl.manifest.meta.get(FAMILY) or {}
    text_col = info.get("text_col", "text")

    def info_update(new_info, new_segs):
        counts = dict(new_info.get("seg_counts") or {})
        live = set(new_info["segments"])
        counts = {p: c for p, c in counts.items() if p in live}
        counts.update(_seg_counts(tbl, new_segs, text_col))
        new_info["seg_counts"] = counts

    return refresh_family_dirs(
        tbl, FAMILY,
        lambda new_segs, version, extra: _write_lex_dir(
            tbl, new_segs, version, text_col, extra=extra),
        seg_col="_seg", max_dirs=max_dirs, info_update=info_update)


def _visible_rows(tbl, terms: list[str] | None, markers: bool,
                  include_pending: bool = False) -> DataFrame:
    """Index rows for the CURRENT live snapshot — stored legs ∪ recompute
    delta leg, then df()'s visibility algebra on the rows. With `terms`,
    postings are filtered at the SCAN (row-group pruned); markers=True
    additionally keeps the per-doc dl rows (term IS NULL).

    include_pending=True is the read-your-writes view (r12 verdict #2 —
    the reference serves staged rows immediately through memtable
    lexicalIndex.Add, engine.go:833-921): staged-but-uncommitted
    segments ride the recompute delta leg (they are real written
    parquet, just unpublished) and the tombstone/winning-LSN legs flip
    to the pending-inclusive view exactly as df(include_pending=True)
    does — so the at-rest search sees the same world as the plain path
    over the writer's snapshot. Other readers still see committed-only."""
    from vecgo_spark.operators.graph_at_rest import blob_paths

    info = tbl.manifest.meta.get(FAMILY)
    if info is None:
        raise KeyError("table has no lexical index; build it first")
    man = tbl.manifest

    current = {s.path for s in man.segments}
    live_indexed = sorted(set(info["segments"]) & current)

    def pick(df):
        cond = None
        if terms is not None:
            cond = F.col("term").isin(list(terms))
        if markers:
            nullc = F.col("term").isNull()
            cond = nullc if cond is None else (cond | nullc)
        return df.where(cond) if cond is not None else df

    legs = []
    if live_indexed:
        stored = tbl._read_parquet_cached(
            [os.path.join(tbl.path, p) for p in blob_paths(info)])
        legs.append(pick(stored.where(F.col("_seg").isin(live_indexed))))
    delta = [s for s in man.segments if s.path not in set(info["segments"])]
    if include_pending:
        delta = delta + list(tbl._pending)
    if delta:
        legs.append(pick(_segment_rows(tbl, delta, info["text_col"])))
    if not legs:
        return tbl.spark.createDataFrame(
            [], "id long, _lsn long, _seg string, term string, tf long, dl long")
    base = legs[0]
    for leg in legs[1:]:
        base = base.unionByName(leg)
    tomb = tbl._tombstones(include_pending=include_pending)
    if tomb is not None:
        tmax = (tomb.groupBy(tbl.id_col).agg(F.max("_lsn").alias("_tomb_lsn"))
                .withColumnRenamed(tbl.id_col, "id"))
        if tbl.tomb_broadcastable(include_pending):  # size-gated
            tmax = F.broadcast(tmax)
        base = (
            base.join(tmax, "id", "left")
            .where(F.col("_tomb_lsn").isNull() | (F.col("_lsn") > F.col("_tomb_lsn")))
            .drop("_tomb_lsn")
        )
    if man.meta.get("has_upserts"):
        # latest version wins — resolved against the table's cached
        # per-id winning-LSN frame (the persisted PK index the vector
        # read path already consults, table._vis_vmax / mvcc.go:125):
        # ONE visibility mechanism for both paths, as in the reference
        # (search.go:1092-1105 and the lexical resolve engine.go:1617-1632
        # both ask the same loaded PK index). Before r12 this leg
        # re-derived per-id max LSN from its own MARKER rows, which
        # forced every term-filtered read to also scan the marker range
        # and re-aggregate — a second, postings-sized visibility
        # mechanism. The frame covers the FULL snapshot (sidecar bytes
        # only), so a term-filtered subset can never elect a stale
        # version whose postings happen to match. ALL rows of the
        # winning version survive the equality join (an id's postings
        # share one _lsn) — same survivors as the old max-filter.
        full = list(man.segments)
        if include_pending:
            full = full + list(tbl._pending)
        vmax = tbl._vis_vmax(full, include_pending=include_pending)
        if vmax is not None:
            vmax = vmax.withColumnRenamed(tbl.id_col, "id")
            if sum(s.rows for s in full) <= _vis_broadcast_cap():
                vmax = F.broadcast(vmax)
            base = (base.join(vmax, "id", "left")
                    .where(F.col("_lsn") == F.col("_vis_lsn"))
                    .drop("_vis_lsn"))
    return base


def _vis_broadcast_cap() -> int:
    from vecgo_spark.plans.table import TOMB_BROADCAST_MAX_IDS
    return TOMB_BROADCAST_MAX_IDS


# churn-path (n_docs, total_len) memo — the reference holds N/Σdl as
# RUNNING counters that are simply read per query (bm25.go:29-53); on a
# churned snapshot we must derive them once from the marker rows + the
# visibility algebra, but the result is immutable per committed snapshot,
# so repeat queries read two ints instead of re-running the marker scan.
# Keyed like the vis cache (path + version); bounded, oldest-first.
_COUNTS_CACHE: dict[tuple, tuple[int, int]] = {}
_COUNTS_CACHE_CAP = 64


def corpus_counts(tbl, include_pending: bool = False) -> tuple[int, int]:
    """(n_docs, total_len) of the live snapshot. Clean snapshot (no
    tombstones, no upserts, everything indexed, no staged rows in view)
    → summed from the manifest counters with ZERO jobs (the reference's
    running counters / count()'s O(#segments) stance); otherwise one
    narrow marker scan with the visibility algebra — per-doc dl
    genuinely needs it — run ONCE per snapshot state (memoized: the
    reference reads running counters per query; repeat churn queries
    here read the memo)."""
    info = tbl.manifest.meta.get(FAMILY)
    if info is None:
        raise KeyError("table has no lexical index; build it first")
    man = tbl.manifest
    counts = info.get("seg_counts") or {}
    clean = (not man.tombstone_files and not tbl._pending_tombs
             and not man.meta.get("has_upserts")
             and not (include_pending and tbl._pending)
             and all(s.path in counts for s in man.segments))
    if clean:
        n = sum(counts[s.path]["docs"] for s in man.segments)
        total = sum(counts[s.path]["len"] for s in man.segments)
        return n, total
    # the marker scan reads committed rows only, so the memo key is the
    # committed snapshot identity (+ the lexical artifact version, which
    # changes what is stored vs recomputed but not the answer — included
    # anyway so a rebuild never serves through a stale entry). Segment
    # paths (uuid-suffixed) ride the key so a table DROPPED and
    # RE-CREATED at the same path — whose version numbers restart — can
    # never serve a stale entry (the _VIS_CACHE keying stance). The
    # pending view appends its state (the _VIS_CACHE len(_pending)
    # stance) so a staged batch never reads a stale committed-view memo
    # and vice versa.
    key = (tbl.path, man.version, info.get("path"), _snapshot_id(man),
           include_pending, len(tbl._pending), len(tbl._pending_tombs))
    hit = _COUNTS_CACHE.get(key)
    if hit is not None:
        return hit
    row = (_visible_rows(tbl, terms=[], markers=True,
                         include_pending=include_pending)
           .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total"))
           .first())
    out = (int(row["n"]), int(row["total"] or 0))
    while len(_COUNTS_CACHE) >= _COUNTS_CACHE_CAP:
        _COUNTS_CACHE.pop(next(iter(_COUNTS_CACHE)))
    _COUNTS_CACHE[key] = out
    return out


# persisted candidate frames (churn path), KEYED BY TABLE PATH so two
# tables served from one session never fight over the slots (r10 verdict
# #7: a module-global list let one hot table evict another's frames),
# then by (manifest version, artifact path, query terms) WITHIN a table
# (r12): a repeated churn query — the dominant serving shape — REUSES
# the materialized frame and its dfmap instead of re-reading the
# postings, the reference's in-memory-postings economics (its index IS
# resident; here residency is the persisted frame). Entries are
# LRU-ordered dicts; each table self-caps at _CACHED_CAP, oldest-first.
_CACHED: dict[str, dict[tuple, tuple[DataFrame, dict]]] = {}
_CACHED_CAP = 8  # per table — a serving session issuing thousands of
# distinct churn-path queries must not accumulate cache entries (each is
# ≤ |query terms| postings, but the registry itself would grow without
# bound). Eviction of a frame backing a returned-but-unconsumed
# DataFrame is CORRECT (Spark recomputes from the postings) but costs
# the single-read goal — consume results within _CACHED_CAP further
# distinct churn queries on the SAME table, or call release_caches()
# between batches.
_RESIDENT_MAX_CANDIDATES = 2_000_000  # clean-path residency gate: Σ df
# over the query terms (known from the sidecars BEFORE any job) bounds
# the candidate frame's rows; above this, the frame streams per query
# instead of occupying the block store — a query for a stop-word-like
# term on a 100 TB corpus must never pin a corpus-sized frame.
_CACHED_GLOBAL_CAP = 32  # across ALL tables — per-table keying (r11)
# must not lose the total bound the original global list enforced: a
# session touching many churned tables (per-tenant scratch tables) would
# otherwise hold 8 persisted frames per table forever. Past the cap the
# oldest-registered table loses its oldest frame first.


def _snapshot_id(man) -> tuple:
    """Identity of a committed snapshot beyond (path, version): segment
    file names are uuid-suffixed, so this tuple distinguishes a table
    dropped and re-created at the same path (whose version numbers
    restart) plus tombstone-set changes that share a version."""
    return (tuple(sorted(s.path for s in man.segments)),
            tuple(sorted(man.tombstone_files)))


def _cached_candidate(table_path: str, key: tuple):
    """(frame, dfmap) for a repeat churn query, or None. LRU-refreshes."""
    slots = _CACHED.get(table_path)
    hit = slots.get(key) if slots else None
    if hit is not None:
        slots[key] = slots.pop(key)
    return hit


def _cache_candidate(table_path: str, key: tuple, frame: DataFrame,
                     dfmap: dict | None = None) -> None:
    slots = _CACHED.setdefault(table_path, {})
    while len(slots) >= _CACHED_CAP:
        slots.pop(next(iter(slots)))[0].unpersist()
    slots[key] = (frame, dfmap or {})
    while sum(len(v) for v in _CACHED.values()) > _CACHED_GLOBAL_CAP:
        # global-cap eviction never targets the table being served right
        # now unless it is the only populated entry (r11 ADVICE: picking
        # the first registered table could immediately unpersist the hot
        # table's own just-cached frames, defeating the cache for
        # exactly the table under load)
        victim = next((k for k, v in _CACHED.items()
                       if v and k != table_path), table_path)
        victim_slots = _CACHED[victim]
        victim_slots.pop(next(iter(victim_slots)))[0].unpersist()
        if not victim_slots:
            del _CACHED[victim]


def evict_stale(table_path: str, man) -> None:
    """Drop this table's cached candidate frames and corpus-count memos
    belonging to SUPERSEDED snapshots (called by vacuum: their postings
    dirs may have just been GC'd, and a cap-evicted stale frame would
    otherwise hit FileNotFound on a recompute — the _VIS_CACHE vacuum
    stance). The current snapshot's entries stay: their dirs are
    referenced and never GC'd."""
    snap = (man.version, _snapshot_id(man))
    slots = _CACHED.get(table_path)
    if slots:
        for key in [k for k in slots if (k[0], k[2]) != snap]:
            slots.pop(key)[0].unpersist()
        if not slots:
            del _CACHED[table_path]
    for key in [k for k in _COUNTS_CACHE
                if k[0] == table_path and (k[1], k[3]) != snap]:
        _COUNTS_CACHE.pop(key)


def release_caches(table_path: str | None = None) -> None:
    """Unpersist candidate frames persisted by bm25_search_at_rest on the
    churn path (long-lived sessions issuing many queries should call this
    once results are consumed). With table_path, only that table's frames
    are released."""
    keys = [table_path] if table_path is not None else list(_CACHED)
    for k in keys:
        for frame, _dfmap in _CACHED.pop(k, {}).values():
            frame.unpersist()


def _stored_term_df(tbl, info, terms: list[str],
                    include_pending: bool = False) -> dict[str, int] | None:
    """{term: docFreq} summed from the per-segment df sidecars — valid
    ONLY on a clean snapshot (no tombstones/upserts, every segment
    indexed, no staged rows in view: then one posting row per (doc,
    term) ⇒ Σ_seg df is the true per-term document frequency, the
    reference's running docFreq, bm25.go:29-53). Returns None when the
    snapshot isn't clean or a sidecar is missing (dirs written before
    the sidecar existed)."""
    from vecgo_spark.operators.graph_at_rest import blob_paths
    from vecgo_spark.plans.manifest import fs_exists

    man = tbl.manifest
    indexed = set(info["segments"])
    clean = (not man.tombstone_files and not tbl._pending_tombs
             and not man.meta.get("has_upserts")
             and not (include_pending and tbl._pending)
             and all(s.path in indexed for s in man.segments))
    if not clean:
        return None
    rels = [df_dir(p) for p in blob_paths(info)]
    if not all(fs_exists(os.path.join(tbl.path, r)) for r in rels):
        return None
    live = {s.path for s in man.segments}
    rows = (
        tbl._read_parquet_cached([os.path.join(tbl.path, r) for r in rels])
        .where(F.col("term").isin(terms) & F.col("_seg").isin(sorted(live)))
        .groupBy("term").agg(F.sum("df").alias("df"))
        .collect()
    )
    out = {t: 0 for t in terms}
    out.update({r["term"]: int(r["df"]) for r in rows})
    return out


def bm25_search_at_rest(tbl, query_text: str, k: int = 10,
                        include_pending: bool = False) -> DataFrame:
    """Top-k BM25 served from the STORED index — bit-identical to
    `bm25.bm25_search(tbl.df(), ...)`: tf/dl/df/N are the same integers
    (stored groupBy counts == size(filter(tokens, =t)) by tokenizer
    determinism), so the literal-idf fixed-term-order score expression
    (bm25.bm25_score) reproduces the same doubles; score desc, id asc,
    round(·, 10) exactly as the plain path.

    At most one postings read per query, zero on a repeat: the (frame,
    dfmap) pair is immutable per committed snapshot + artifact + term
    set, so a REPEAT query serves both from the keyed cache — the
    reference's resident-index economics (its postings live in memory;
    here residency is the persisted frame; release_caches() frees them).
    A fresh CLEAN-snapshot query takes per-term docFreq from the STORED
    df sidecars (a |terms|-row lookup, the reference's running counters)
    and the scoring pass reads the candidate postings exactly once —
    persisting them for reuse ONLY when the sidecar dfmap proves the
    candidate set is bounded (Σ df ≤ _RESIDENT_MAX_CANDIDATES; a
    common-term corpus-sized frame on a 100 TB table must stream, never
    occupy the block store). A fresh CHURN-path query persists
    unconditionally so the df aggregate and the score pass share one
    read (the df aggregate already materializes it)."""
    spark = tbl.spark
    qterms: dict[str, int] = {}
    for t in tokenize_py(query_text):
        qterms[t] = qterms.get(t, 0) + 1
    if not qterms:
        return spark.createDataFrame([], "id long, score double")
    terms = sorted(qterms)

    n_docs, total_len = corpus_counts(tbl, include_pending=include_pending)
    avg_dl = float(total_len) / float(n_docs) if n_docs else 0.0
    if n_docs == 0 or avg_dl == 0.0:
        return spark.createDataFrame([], "id long, score double")
    n = float(n_docs)

    from vecgo_spark import cache_stats

    info = tbl.manifest.meta[FAMILY]
    # pending state rides the key (the _VIS_CACHE stance): a staged
    # batch never reuses a committed-view frame and vice versa
    ckey = (tbl.manifest.version, info.get("path"),
            _snapshot_id(tbl.manifest), tuple(terms),
            include_pending, len(tbl._pending), len(tbl._pending_tombs))
    hit = _cached_candidate(tbl.path, ckey)
    cache_stats.record("lexical_candidates", hit is not None,
                       scope=tbl.path)
    if hit is not None:
        # repeat query: frame AND dfmap from the cache — not even the
        # |terms|-row sidecar lookup runs
        cand, dfmap = hit
    else:
        dfmap = _stored_term_df(tbl, info, terms,
                                include_pending=include_pending)
        cand = (
            _visible_rows(tbl, terms=terms, markers=False,
                          include_pending=include_pending)
            .groupBy("id")
            .agg(F.max("dl").alias("dl"),
                 *[F.coalesce(
                     F.max(F.when(F.col("term") == F.lit(t), F.col("tf"))),
                     F.lit(0)).alias(f"tf_{i}") for i, t in enumerate(terms)])
        )
        if dfmap is None:  # churn path, first time for this term set
            cand = cand.persist()
            row = cand.agg(
                *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
                  for i in range(len(terms))],
            ).first()
            dfmap = {t: int(row[f"df_{i}"] or 0) for i, t in enumerate(terms)}
            _cache_candidate(tbl.path, ckey, cand, dfmap)
        elif sum(dfmap.values()) <= _RESIDENT_MAX_CANDIDATES:
            # clean path: the sidecar dfmap bounds |candidates| BEFORE
            # any job runs — small enough to keep resident for repeats
            cand = cand.persist()
            _cache_candidate(tbl.path, ckey, cand, dfmap)

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        df_t = dfmap[t]
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        tf = F.col(f"tf_{i}").cast("double")
        dl = F.col("dl").cast("double")
        contrib = F.lit(float(qterms[t])) * (
            F.lit(idf)
            * ((tf * F.lit(K1 + 1.0)) / (tf + F.lit(K1 * (1.0 - B)) + F.lit(K1 * B / avg_dl) * dl))
        )
        score = score + F.when(F.col(f"tf_{i}") > 0, contrib).otherwise(F.lit(0.0))
    return (
        cand.select("id", score.alias("score"))
        .where(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
        .select("id", F.round(F.col("score"), 10).alias("score"))
    )
