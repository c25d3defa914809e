"""Text-corpus sources/sinks: JSONL and CSV readers plus deterministic
sharded writers — the ingest/egress formats of a large-scale training-data
pipeline (documents usually arrive as *.jsonl.gz, leave as sharded files).

Scale posture:
- Readers take an EXPLICIT schema. Schema inference reads the data twice;
  at 100 TB that is a full extra pass, so `read_jsonl(infer=True)` is an
  opt-in for exploration only.
- Malformed lines land in a `_corrupt_record` column (PERMISSIVE mode)
  instead of failing the job — corpus files at scale always contain a few
  broken lines; dropping silently or dying are both wrong, so the caller
  can count/quarantine them.
- The sharded writer partitions by a deterministic hash shard (same
  stable_hash64 the sampler uses), so re-running the export reproduces
  byte-identical shard membership — no dependence on input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vecgo_spark.functions.hashing import stable_hash64

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if "_corrupt_record" in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])


def _parse_lines(raw: DataFrame, schema: T.StructType, parse_fn) -> DataFrame:
    """text scan → from_json/from_csv parse. Parsing the line column
    ourselves (instead of spark.read.json/csv) sidesteps Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on raw scans, so
    downstream counts/filters on `_corrupt_record` need no caching."""
    full = _with_corrupt(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}
    j = parse_fn(F.col("value"), full, opts)
    return raw.select(j.alias("j")).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in full.fields]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON (optionally .gz/.zstd — Spark picks the
    codec from the extension). PERMISSIVE: malformed lines fill
    `_corrupt_record` and NULL the data columns."""
    if infer:
        return spark.read.json(path)  # exploration only: extra full pass
    return _parse_lines(spark.read.text(path), schema or DOCUMENTS_SCHEMA, F.from_json)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV reader with explicit schema (inference off by default)."""
    if schema is None:
        return (
            spark.read.option("header", header).option("sep", sep)
            .option("inferSchema", True).csv(path)
        )
    raw = spark.read.text(path)
    if header:
        hdr = ",".join(f.name for f in schema.fields)
        raw = raw.where(F.col("value") != hdr)

    def parse(col, full, opts):
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in full.fields)
        return F.from_csv(col, ddl, {**opts, "sep": sep})

    return _parse_lines(raw, schema, parse)


def corrupt_count(df: DataFrame) -> int:
    """How many input lines failed to parse (PERMISSIVE quarantine)."""
    if "_corrupt_record" not in df.columns:
        return 0
    return df.where(F.col("_corrupt_record").isNotNull()).count()


def valid_rows(df: DataFrame) -> DataFrame:
    """Drop quarantined lines and the bookkeeping column."""
    if "_corrupt_record" not in df.columns:
        return df
    return df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 32,
    id_col: str = "doc_id",
    compression: str | None = None,
    shard_seed: int = 7,
) -> None:
    """Export as shard-partitioned JSONL: shard = stable_hash64(id) %
    n_shards, written as partition directories (shard=K/part-*.json[.gz]).

    Deterministic shard membership (hash of id, not of partition layout),
    so incremental re-exports and the pack_sequences layout agree on which
    shard a document belongs to."""
    out = df.withColumn(
        "shard",
        (stable_hash64(F.col(id_col).cast("string"), seed=shard_seed) % n_shards).cast("int"),
    )
    writer = out.repartition("shard").write.mode("overwrite").partitionBy("shard")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
