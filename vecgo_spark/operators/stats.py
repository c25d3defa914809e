"""Segment statistics collection — the reference's StatsCollector
(/root/reference/internal/manifest/stats_collector.go:20-615; struct
internal/manifest/stats.go:19-224): per-segment row counts, per-field
numeric min/max/sum/count + 16-bin histogram, categorical distinct-count /
top-k frequencies / dominant value+ratio / Shannon entropy, vector
centroid + norm statistics. These stats drive manifest segment pruning
(vecgo_spark.plans.pruning) and selectivity estimation.

Spark design: each profile is ONE groupBy(segment).agg pass (map-side
partial aggregation; result is O(#segments × #fields) — manifest-sized,
never row-sized, which is what keeps it viable at 100 TB).

Determinism notes (oracle parity):
  * counts / min / max / distinct are order-independent → exact.
  * money sums go through integer cents (exact, associative).
  * entropy folds over the VALUE-SORTED (value,count) list sequentially —
    same order in Spark and DuckDB → bit-exact doubles.
  * histogram bins: `linear` mode uses only +,-,*,/ (IEEE-identical across
    engines → oracle-exact); `log` mode (the reference's scale,
    stats_collector.go:446-529) uses ln() whose last-ulp may differ between
    libm implementations → verified in pytest against numpy instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Persisted intermediates owned by this module (the range-partitioned
# selection frames of exact_percentiles / grouped_percentiles — persisted
# because spark_partition_id() is non-deterministic across re-executions).
# Same stance as pipeline._CACHED; long sessions call release_caches()
# between runs (ADVICE r7 #4).
_CACHED: list = []


def release_caches() -> None:
    """Unpersist every DataFrame cached by this module's operators."""
    while _CACHED:
        _CACHED.pop().unpersist()


# ------------------------------------------------------------- numeric

def numeric_profile(
    df: DataFrame, seg_col: str, col: str, cents: bool = False
) -> DataFrame:
    """count / nulls / min / max / sum / mean per segment
    (FieldStats numeric side, stats.go:19-120). With cents=True the sum
    accumulates integer cents (exact for 2-decimal money columns)."""
    x = F.col(col)
    if cents:
        s = F.sum(F.round(x * 100).cast("long"))
        sum_expr = (s.cast("double") / F.lit(100.0)).alias("sum")
        mean_expr = (s.cast("double") / F.lit(100.0) / F.count(x).cast("double")).alias("mean")
    else:
        sum_expr = F.sum(x).alias("sum")
        mean_expr = F.avg(x).alias("mean")
    return (
        df.groupBy(seg_col)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.when(x.isNull(), 1).otherwise(0)).cast("long").alias("null_count"),
            F.min(x).alias("min"),
            F.max(x).alias("max"),
            sum_expr,
            mean_expr,
        )
        .orderBy(seg_col)
    )


def numeric_profile_sql(table: str, seg_expr: str, col: str, cents: bool = False) -> str:
    if cents:
        s = f"SUM(CAST(round({col} * 100) AS BIGINT))"
        sum_sql = f"CAST({s} AS DOUBLE) / 100.0 AS sum"
        mean_sql = f"CAST({s} AS DOUBLE) / 100.0 / CAST(COUNT({col}) AS DOUBLE) AS mean"
    else:
        sum_sql = f"SUM({col}) AS sum"
        mean_sql = f"AVG({col}) AS mean"
    return f"""
        SELECT {seg_expr} AS seg,
               COUNT(*) AS row_count,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
               MIN({col}) AS min, MAX({col}) AS max,
               {sum_sql}, {mean_sql}
        FROM {table}
        GROUP BY seg
        ORDER BY seg
    """


# ------------------------------------------------------------ histogram

def histogram(
    df: DataFrame, seg_col: str, col: str, bins: int = 16, scale: str = "linear"
) -> DataFrame:
    """Per-(segment, bin): count + bin min/max (the reference's 16-bin
    per-bin-min/max histogram, stats_collector.go:446-529; reference uses
    log scale, `linear` provided for oracle-exact comparison).

    Bin bounds come from the segment's own min/max, computed as a
    manifest-sized aggregate (O(#segments) rows) broadcast back onto the
    rows. r14: this replaces a Window.partitionBy(seg) min/max — the
    window shuffled EVERY row into #segments partitions (guide §2.5: a
    handful of segment values means a handful of tasks own the whole
    table — skew by construction at any scale) and sorted them; the agg
    form shuffles only the map-side partial (lo, hi) rows and keeps the
    binning pass embarrassingly parallel. Two column-pruned scans replace
    one full-row shuffle+sort; lo/hi are the exact same min/max values,
    so every bin id and the final aggregate are bit-identical."""
    x = F.col(col).cast("double")
    # project early (guide §2.3): only (seg, value) flow into the join —
    # and the helper names are collision-proofed against the two USER
    # columns that remain in the stream (r14 ADVICE: a user table already
    # carrying _bseg/_lo/_hi made the join condition ambiguous where the
    # window form worked)
    cols = [seg_col] if seg_col == col else [seg_col, col]
    d = df.where(x.isNotNull()).select(*cols)
    tag = ""
    while any(f"_{nm}{tag}" in cols for nm in ("bseg", "lo", "hi")):
        tag += "_"
    nseg, nlo, nhi = f"_bseg{tag}", f"_lo{tag}", f"_hi{tag}"
    b = (
        d.groupBy(F.col(seg_col).alias(nseg))
        .agg(F.min(x).alias(nlo), F.max(x).alias(nhi))
    )
    # eqNullSafe: a NULL segment is a window partition of its own — the
    # join must keep those rows exactly as the window form did
    lo, hi = F.col(nlo), F.col(nhi)
    span = hi - lo
    if scale == "log":
        pos = F.ln(x - lo + F.lit(1.0)) / F.ln(span + F.lit(1.0))
    else:
        pos = (x - lo) / span
    raw = F.floor(pos * F.lit(float(bins)))
    bin_idx = (
        F.when(span == 0.0, F.lit(0))
        .otherwise(F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw.cast("int"))))
        .cast("int")
    )
    return (
        d.join(F.broadcast(b), F.col(seg_col).eqNullSafe(F.col(nseg)))
        .withColumn("bin", bin_idx)
        .groupBy(seg_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("bin_count"),
            F.min(x).alias("bin_min"),
            F.max(x).alias("bin_max"),
        )
        .orderBy(seg_col, "bin")
    )


def histogram_sql(table: str, seg_expr: str, col: str, bins: int = 16) -> str:
    """Linear-scale DuckDB mirror (identical +,-,*,/ op order)."""
    x = f"{col}::DOUBLE"
    return f"""
        WITH bounds AS (
            SELECT {seg_expr} AS seg, {x} AS x,
                   MIN({x}) OVER (PARTITION BY {seg_expr}) AS lo,
                   MAX({x}) OVER (PARTITION BY {seg_expr}) AS hi
            FROM {table}
            WHERE {col} IS NOT NULL
        ),
        binned AS (
            SELECT seg, x,
                   CASE WHEN hi - lo = 0.0 THEN 0
                        ELSE least({bins - 1}, greatest(0,
                             CAST(floor((x - lo) / (hi - lo) * {float(bins)!r}) AS INT)))
                   END AS bin
            FROM bounds
        )
        SELECT seg, CAST(bin AS INT) AS bin,
               COUNT(*) AS bin_count, MIN(x) AS bin_min, MAX(x) AS bin_max
        FROM binned
        GROUP BY seg, bin
        ORDER BY seg, bin
    """


# ---------------------------------------------------------- categorical

def categorical_profile(
    df: DataFrame, seg_col: str, col: str
) -> DataFrame:
    """distinct count, dominant value + ratio, Shannon entropy per segment
    (stats_collector.go:288-553: ndv, top-16 freq, dominant ratio,
    entropy). Entropy folds the value-sorted (value,count) list
    sequentially → bit-reproducible."""
    x = F.col(col)
    counts = (
        df.where(x.isNotNull())
        .groupBy(seg_col, col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vc = F.sort_array(F.collect_list(F.struct(F.col(col).alias("val"), F.col("cnt").alias("cnt"))))
    per_seg = counts.groupBy(seg_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max_by(F.struct(F.col("cnt").alias("cnt"), F.col(col).alias("val")),
                 F.struct(F.col("cnt"), F.col(col).cast("string"))).alias("dom"),
        vc.alias("vc"),
    )
    n = F.col("n_rows").cast("double")
    entropy = -F.aggregate(
        F.col("vc"),
        F.lit(0.0),
        lambda acc, s: acc + (s["cnt"].cast("double") / n) * F.ln(s["cnt"].cast("double") / n),
    )
    return per_seg.select(
        seg_col,
        "n_distinct",
        "n_rows",
        F.col("dom")["val"].alias("dominant_value"),
        (F.col("dom")["cnt"].cast("double") / n).alias("dominant_ratio"),
        entropy.alias("entropy"),
    ).orderBy(seg_col)


def categorical_profile_sql(table: str, seg_expr: str, col: str) -> str:
    """DuckDB mirror. Dominant = (max count, then max value) — matches the
    Spark max_by struct ordering. Entropy: list ordered by value, same
    sequential fold. NOTE ln() here is evaluated on p=cnt/n doubles whose
    inputs are integer-exact, and the fold order is pinned — verified
    bit-equal on the test tables."""
    return f"""
        WITH counts AS (
            SELECT {seg_expr} AS seg, {col} AS val, COUNT(*) AS cnt
            FROM {table}
            WHERE {col} IS NOT NULL
            GROUP BY seg, val
        ),
        per_seg AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   (MAX(ROW(cnt, val::VARCHAR, val)))[3] AS dominant_value,
                   (MAX(ROW(cnt, val::VARCHAR, val)))[1] AS dom_cnt,
                   list((val, cnt) ORDER BY val) AS vc
            FROM counts
            GROUP BY seg
        )
        SELECT seg, n_distinct, n_rows, dominant_value,
               CAST(dom_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS dominant_ratio,
               -list_sum(list_transform(vc, s ->
                   (s[2]::DOUBLE / n_rows::DOUBLE) * ln(s[2]::DOUBLE / n_rows::DOUBLE)
               )) AS entropy
        FROM per_seg
        ORDER BY seg
    """


# -------------------------------------------------------------- vector

def vector_profile(
    df: DataFrame, seg_col: str, vector_col: str, exact_mean: bool = False
) -> DataFrame:
    """Per-segment centroid + norm stats (stats_collector.go:554-614:
    vector norms, centroid, radius).

    exact_mean=False: one streaming F.avg (order-dependent float mean —
    the 100 TB shape; numpy-parity pytest only). exact_mean=True: the
    mean folds the VALUE-SORTED norm list sequentially — order-independent
    by construction, hence bit-reproducible against the DuckDB oracle
    (vector_profile_sql). Costs a collect_list per segment; segments are
    size-bounded at rest, so the list stays bounded too."""
    from vecgo_spark.functions.vector import l2_norm

    dims = (
        df.select(seg_col, F.posexplode(F.col(vector_col).cast("array<double>")).alias("dim", "x"))
        .groupBy(seg_col, "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy(seg_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(seg_col, F.transform("dc", lambda s: s["c"]).alias("centroid"))
    )
    if exact_mean:
        mean_expr = (
            F.aggregate(
                F.array_sort(F.collect_list("nrm")), F.lit(0.0), lambda acc, x: acc + x
            )
            / F.count(F.lit(1))
        ).alias("mean_norm")
    else:
        mean_expr = F.avg("nrm").alias("mean_norm")
    norms = df.select(seg_col, l2_norm(vector_col).alias("nrm")).groupBy(seg_col).agg(
        mean_expr,
        F.max("nrm").alias("max_norm"),
        F.count(F.lit(1)).alias("row_count"),
    )
    return norms.join(dims, seg_col).orderBy(seg_col)


def vector_profile_sql(table: str, seg_expr: str, vector_col: str) -> str:
    """DuckDB mirror of the driver's vector-profile projection
    (seg, row_count, mean_norm, max_norm, dim) with exact_mean semantics:
    norm = sqrt(sequential x·x fold) per row, mean = sequential fold over
    the value-sorted norm list / count."""
    from vecgo_spark.oracles import dot_sql

    nrm = f"sqrt({dot_sql(vector_col, vector_col)})"
    return f"""
        SELECT {seg_expr} AS seg,
               COUNT(*) AS row_count,
               list_sum(list_sort(list({nrm}))) / COUNT(*) AS mean_norm,
               MAX({nrm}) AS max_norm,
               CAST(MAX(len({vector_col})) AS INT) AS dim
        FROM {table}
        GROUP BY seg
        ORDER BY seg
    """


# --------------------------------------------------- exact percentiles

def _bucket_col(lo: float, hi: float, nb: int) -> Column:
    """Deterministic equi-width bucket id for v in [lo, hi], WEAKLY
    MONOTONE in v for every input (clamped to [0, nb-1]; NaN → last
    bucket, matching Spark's NaN-sorts-largest ordering) — so the global
    ranks derived from (bucket asc, v asc) are correct for ANY bounds;
    bounds accuracy affects only partition balance, never results.
    Monotonicity holds in IEEE double: x−c, x·c and x/c (c>0) are
    order-preserving, floor/least/greatest preserve weak order."""
    span = hi - lo
    if not (span > 0):
        return F.lit(0)
    raw = F.floor((F.col("v") - F.lit(float(lo))) / F.lit(float(span)) * F.lit(float(nb)))
    clamped = F.least(F.lit(nb - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw))
    return F.when(F.isnan("v"), F.lit(nb - 1).cast("long")).otherwise(clamped)


def exact_percentiles(
    df: DataFrame, value_col: str, ps: list[float], n_partitions: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact linear-interpolated percentiles (type-7 / quantile_cont
    semantics: rank = (n-1)·p, value = v_lo + (v_hi − v_lo)·frac) via
    distributed selection — NOT a single-partition global window.

    Plan: deterministic equi-width bucket key over [lo, hi] →
    per-partition row_number (bounded windows) → tiny per-bucket count
    aggregate gives each bucket's global offset (broadcast back) →
    global rank = offset + local rank → keep only the ≤2·|ps| target
    ranks → broadcast-join against the literal (p, lo, hi, frac) table
    and interpolate. One keyed shuffle, no driver collect of data rows;
    survives 100 TB because every window is per-bucket and the offset
    table has one row per bucket.

    (r14, measured and REJECTED: filtering the windowed frame to only
    the ≤2·|ps| partitions that contain a target rank — derived in-plan
    from the count aggregate — is the right sort-work bound at scale,
    but the extra broadcast dependency chain (counts → needed-pid
    nested-loop join → probe) serialized job legs that previously
    pipelined and cost +10-60% at bench SF in three consecutive
    interleaved A/B rounds (1.82→2.98, 1.51→1.94, 1.49→1.67 s).
    Revisit if the per-partition sort ever dominates: the correct form
    needs the pid set known before the job, not as a broadcast leg.)

    ONE job over the data (the selection) — the target ranks are derived
    IN-PLAN from the bucket-count aggregate, so there is no separate
    COUNT(*) pass over the input (r14: that pass was a full extra corpus
    scan at any scale; the rank arithmetic — (n−1)·p, floor/ceil, frac —
    is the same IEEE double op sequence whether computed driver-side or
    in the plan).

    ``bounds=(lo, hi)`` (r14): the caller's known value range, e.g. the
    exact parquet footer min/max of a raw column — zero data passes.
    Without it (r15, closes the r14 fallback item): one narrow min/max
    aggregate computes exact bounds — replacing the old
    repartitionByRange fallback, whose internal reservoir SAMPLE was a
    full extra pass AND whose non-deterministic spark_partition_id() key
    forced a persist. Results are bit-identical for ANY bounds (the
    bucket id is weakly monotone in v, see _bucket_col); bounds accuracy
    only buys partition balance. Buckets = 32× parallelism (guide §2.5:
    many more key values than partitions so the hash spreads), so a
    skewed distribution costs imbalance bounded by span/nb, and the
    per-bucket window sort spills gracefully if one bucket is hot.
    """
    d = df.select(F.col(value_col).cast("double").alias("v")).where(F.col("v").isNotNull())
    spark = df.sparkSession

    np_ = n_partitions or spark.sparkContext.defaultParallelism
    if bounds is None:
        # r15 (closes the r14 "Not yet optimized" fallback + the r14
        # verdict Next #7): inputs WITHOUT footer stats used to fall back
        # to repartitionByRange — whose internal reservoir SAMPLE is a
        # full extra pass over the input at any scale — plus a persist,
        # because spark_partition_id() is non-deterministic across
        # re-executions. One narrow min/max aggregate (column-pruned,
        # map-side partial) is the same pass count, yields EXACT bounds,
        # and the deterministic bucket key then needs no persist. Results
        # are bit-identical for any bounds (weakly monotone bucket id —
        # the bounds=... contract above); an all-NULL/empty input leaves
        # lo NULL → one degenerate bucket → the n-is-NULL target guard
        # below still returns the declared empty frame.
        row = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
        bounds = ((float(row["lo"]), float(row["hi"]))
                  if row["lo"] is not None else (0.0, 0.0))
    nb = max(64, 32 * np_)
    keyed = d.withColumn("pid", _bucket_col(float(bounds[0]), float(bounds[1]), nb))
    ranked = keyed
    # tiny (≤nb rows) pre-aggregated count table — partial map-side
    # aggregation means this second scan shuffles bucket counts only
    counts = keyed.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w0 = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w0), F.lit(0)).cast("long")
    ).select("pid", "off")
    # target-rank table from the SAME tiny partition-count aggregate
    # (one row; empty input → n = sum(∅) = NULL → zero target rows →
    # empty result with the declared schema)
    psdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    rank = (F.col("n") - F.lit(1)).cast("double") * F.col("p")
    tdf = (
        counts.agg(F.sum("cnt").cast("long").alias("n"))
        .where(F.col("n").isNotNull())
        .crossJoin(F.broadcast(psdf))
        .select("p", rank.alias("rank"))
        .select(
            "p",
            (F.floor("rank") + F.lit(1)).cast("long").alias("lo"),
            (F.ceil("rank") + F.lit(1)).cast("long").alias("hi"),
            (F.col("rank") - F.floor("rank").cast("double")).alias("frac"),
        )
    )
    need = tdf.select(F.explode(F.array("lo", "hi")).alias("grank")).distinct()
    wp = Window.partitionBy("pid").orderBy("v")
    g = (
        ranked.withColumn("rn", F.row_number().over(wp))
        .join(F.broadcast(offs), "pid")
        .withColumn("grank", (F.col("off") + F.col("rn")).cast("long"))
        .join(F.broadcast(need), "grank")
        .select("grank", "v")
    )
    lo_v = g.select(F.col("grank").alias("lo"), F.col("v").alias("v_lo"))
    hi_v = g.select(F.col("grank").alias("hi"), F.col("v").alias("v_hi"))
    return (
        tdf.join(F.broadcast(lo_v), "lo")
        .join(F.broadcast(hi_v), "hi")
        .select(
            "p",
            (F.col("v_lo") + (F.col("v_hi") - F.col("v_lo")) * F.col("frac")).alias("value"),
        )
        .orderBy("p")
    )


def exact_percentiles_sql(table: str, value_col: str, ps: list[float]) -> str:
    """DuckDB twin: same rank/interpolation formula, same double op order
    ((n−1)·p computed in IEEE double both sides)."""
    vals = ", ".join(f"(CAST({float(p)!r} AS DOUBLE))" for p in ps)
    return f"""
    WITH d AS (SELECT CAST({value_col} AS DOUBLE) AS v FROM {table} WHERE {value_col} IS NOT NULL),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM d),
    n AS (SELECT count(*) AS c FROM d),
    ps(p) AS (VALUES {vals}),
    t AS (SELECT p, floor((c - 1) * p) AS lo, ceil((c - 1) * p) AS hi,
                 (c - 1) * p - floor((c - 1) * p) AS frac
          FROM ps, n)
    SELECT t.p,
           (SELECT v FROM r WHERE rn = t.lo + 1)
           + ((SELECT v FROM r WHERE rn = t.hi + 1) - (SELECT v FROM r WHERE rn = t.lo + 1)) * t.frac
               AS value
    FROM t ORDER BY t.p
    """


def grouped_percentiles(
    df: DataFrame, group_col: str, value_col: str, ps: list[float],
    n_partitions: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """PER-GROUP exact linear-interpolated percentiles (type-7 /
    quantile_cont: rank = (n_g−1)·p per group) — the per-source length
    quantiles a pretraining pipeline reports, computed by distributed
    selection, NOT one window partition per group (a mega-source would
    serialize through a single task — the token_budget_mixture bug
    class).

    Plan: range-repartition by (group, value) → per-partition row_number
    inside bounded (pid, group) windows → a tiny per-(pid, group) count
    aggregate yields each partition's per-group offset (broadcast back) →
    global in-group rank = offset + local rank → join against the
    per-group (p, lo, hi, frac) target table (one row per group × p,
    built from a per-group count aggregate — never collected) and
    interpolate.  One range shuffle over the data plus manifest-sized
    aggregates; every window is per-partition, so a group spanning many
    partitions spreads over that many tasks.

    The range-partitioned frame is persisted (spark_partition_id() is
    non-deterministic across re-executions) and registered for
    release_caches().  Output: (group_col, p, value), exact to the
    DuckDB quantile formula (same IEEE op order).

    r14 ``bounds=(lo, hi)``: same contract as exact_percentiles(bounds=)
    — a GLOBAL value range (e.g. parquet footer min/max) swaps the range
    shuffle for a deterministic equi-width bucket key: no sample pass,
    no persist (the key is stable across re-executions). Per-group
    correctness is bounds-independent (weakly monotone bucket id); the
    global bounds only set bucket balance within each group."""
    d = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    spark = df.sparkSession
    np_ = n_partitions or spark.sparkContext.defaultParallelism
    if bounds is None:
        # r15: same fallback upgrade as exact_percentiles — one narrow
        # min/max aggregate replaces repartitionByRange's internal sample
        # pass AND the persist its non-deterministic partition id forced
        row = d.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
        bounds = ((float(row["lo"]), float(row["hi"]))
                  if row["lo"] is not None else (0.0, 0.0))
    nb = max(64, 32 * np_)
    ranked = d.withColumn("pid", _bucket_col(float(bounds[0]), float(bounds[1]), nb))
    counts = ranked.groupBy("pid", "grp").agg(F.count(F.lit(1)).alias("cnt"))
    w0 = (
        Window.partitionBy("grp").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "pid", "grp",
        F.coalesce(F.sum("cnt").over(w0), F.lit(0)).cast("long").alias("off"),
    )
    wp = Window.partitionBy("pid", "grp").orderBy("v")
    g = (
        ranked.withColumn("rn", F.row_number().over(wp))
        .join(F.broadcast(offs), ["pid", "grp"])
        .select("grp", (F.col("off") + F.col("rn")).cast("long").alias("grank"), "v")
    )
    n_g = counts.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n"))
    pdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    targets = (
        n_g.crossJoin(F.broadcast(pdf))
        .select(
            "grp", "p",
            (F.floor((F.col("n") - 1) * F.col("p")) + 1).cast("long").alias("lo"),
            (F.ceil((F.col("n") - 1) * F.col("p")) + 1).cast("long").alias("hi"),
            ((F.col("n") - 1) * F.col("p")
             - F.floor((F.col("n") - 1) * F.col("p"))).alias("frac"),
        )
    )
    lo_v = g.select("grp", F.col("grank").alias("lo"), F.col("v").alias("v_lo"))
    hi_v = g.select("grp", F.col("grank").alias("hi"), F.col("v").alias("v_hi"))
    return (
        targets.join(lo_v, ["grp", "lo"]).join(hi_v, ["grp", "hi"])
        .select(
            F.col("grp").alias(group_col), "p",
            (F.col("v_lo") + (F.col("v_hi") - F.col("v_lo")) * F.col("frac"))
            .alias("value"),
        )
        .orderBy(group_col, "p")
    )


def grouped_percentiles_sql(
    table: str, group_col: str, value_col: str, ps: list[float],
) -> str:
    """DuckDB twin of grouped_percentiles: identical rank formula and
    IEEE interpolation order per group."""
    vals = ", ".join(f"(CAST({float(p)!r} AS DOUBLE))" for p in ps)
    return f"""
    WITH d AS (SELECT {group_col} AS grp, CAST({value_col} AS DOUBLE) AS v
               FROM {table} WHERE {value_col} IS NOT NULL),
    r AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
          FROM d),
    n AS (SELECT grp, count(*) AS c FROM d GROUP BY grp),
    ps(p) AS (VALUES {vals}),
    t AS (SELECT grp, p, floor((c - 1) * p) + 1 AS lo, ceil((c - 1) * p) + 1 AS hi,
                 (c - 1) * p - floor((c - 1) * p) AS frac
          FROM n, ps)
    SELECT t.grp AS {group_col}, t.p,
           lo.v + (hi.v - lo.v) * t.frac AS value
    FROM t
    JOIN r lo ON lo.grp = t.grp AND lo.rn = t.lo
    JOIN r hi ON hi.grp = t.grp AND hi.rn = t.hi
    ORDER BY {group_col}, t.p
    """


def cluster_label_purity(
    emb: DataFrame, model, label_col: str = "label",
    vector_col: str = "embedding",
) -> DataFrame:
    """Cluster-quality diagnostic against ground-truth labels: assign
    every vector to its nearest centroid (the deterministic IVF argmin,
    a plan literal) and report, per cluster, the row count, distinct
    label count, dominant label and purity = dominant/total — the
    label-agreement check run after (re)training a clustering used for
    SemDeDup / cluster-balanced sampling.

    Exactness: counts are integers, the argmin assignment is the
    bit-exact assign_expr both engines share, purity is one IEEE
    division; dominant ties break to the smallest label.  One
    (cluster, label) groupBy (map-side combine, output ≤ nlist × #labels
    rows) then an nlist-sized rollup — manifest-sized results at any
    corpus scale."""
    from vecgo_spark.operators import ivf as ivfmod

    counts = (
        emb.select(
            ivfmod.assign_expr(model, vector_col).alias("cluster_id"),
            F.col(label_col).alias("label"),
        )
        .groupBy("cluster_id", "label").agg(F.count(F.lit(1)).alias("n"))
    )
    # type-agnostic (n DESC, label ASC) tie-break: struct min orders
    # lexicographically, so min(struct(-n, label)) picks the largest
    # count then the SMALLEST label for ANY orderable label type —
    # string ground-truth labels included (ADVICE r8: a negated label
    # column only worked for numerics, while the SQL twin's ORDER BY
    # n DESC, label ASC always did)
    dom = F.min(
        F.struct((-F.col("n")).alias("negn"), F.col("label").alias("label")))
    return (
        counts.groupBy("cluster_id")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            dom.alias("_dom"),
        )
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "n_rows", "n_labels",
            F.col("_dom")["label"].alias("dominant_label"),
            ((-F.col("_dom")["negn"]).cast("double") /
             F.col("n_rows").cast("double")).alias("purity"),
        )
        .orderBy("cluster_id")
    )


def cluster_label_purity_sql(
    model, emb_table: str = "embeddings", label_col: str = "label",
    vector_col: str = "embedding",
) -> str:
    from vecgo_spark.operators.ivf import assign_sql

    return f"""
    WITH a AS (
        SELECT CAST({assign_sql(model, vector_col)} AS INT) AS cluster_id,
               {label_col} AS label
        FROM {emb_table}
    ),
    c AS (SELECT cluster_id, label, count(*) AS n FROM a GROUP BY cluster_id, label),
    d AS (
        SELECT cluster_id, label AS dominant_label, n AS dom_n,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n DESC, label ASC) AS rn
        FROM c
    )
    SELECT c2.cluster_id,
           CAST(sum(c2.n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_labels,
           any_value(d.dominant_label) AS dominant_label,
           CAST(any_value(d.dom_n) AS DOUBLE) / CAST(sum(c2.n) AS DOUBLE) AS purity
    FROM c c2 JOIN d ON d.cluster_id = c2.cluster_id AND d.rn = 1
    GROUP BY c2.cluster_id
    ORDER BY c2.cluster_id
    """
