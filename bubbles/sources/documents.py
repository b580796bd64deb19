"""Document-corpus ingestion (north-star scope: a training-data
pipeline's raw input is JSONL/CSV crawl dumps, not parquet).

Contract: explicit schema (never schema inference — an inference
pass over 100 TB is a full extra scan and a schema lottery),
PERMISSIVE mode with a corrupt-record quarantine column so one
malformed line costs one row, not a stage retry loop (same policy as
`operators.multimodal.decode_media_real`'s per-blob quarantine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, _corrupt string"
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus reader. Returns the documents schema plus a
    ``_corrupt`` column holding the raw line for rows that failed to
    parse (all other fields NULL there). Splittable at scale:
    uncompressed/bzip2 JSONL parallelizes by HDFS block; gzip does
    not (one stream per file) — shard gzip inputs upstream."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV corpus reader with the same quarantine contract (header
    expected; multiline quoting off — multiline CSV is not splittable
    and a single runaway quote would swallow the shard)."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("multiLine", "false")
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows drop the ``_corrupt`` column;
    quarantined rows keep the FULL row — the raw line in ``_corrupt``
    plus whatever fields did parse. (Also load-bearing: Spark refuses
    raw JSON/CSV queries whose pruned schema is ONLY the corrupt
    column — QUERY_ONLY_CORRUPT_RECORD_COLUMN — so the quarantine
    side must reference the data columns anyway.)"""
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull())
    return clean, bad


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple = ("split",),
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> None:
    """Hive-partitioned parquet corpus writer — the layout a training
    job consumes (``.../split=train/lang=en/part-*.parquet``).
    Partition columns become directories, so a downstream
    ``read.parquet(path).filter(split='train')`` prunes whole
    directories at plan time (zero I/O for the other splits — the
    same partition-pruning contract the engine's scans rely on).

    ``maxRecordsPerFile`` bounds file size without an extra
    repartition job: Spark rolls to a new file mid-task, so one
    writer task never produces a multi-GB file that a later reader
    can't split by row group. No coalesce(1)-style funnels — every
    task writes its own files in parallel (a single-file "tidy"
    output is a driver-width bottleneck at any real scale)."""
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in frame: {missing}")
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_corpus_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> None:
    """ORC sibling of ``write_corpus`` — same Hive-partitioned layout
    and per-file record bound, for consumers standardized on the ORC
    stack (Hive/Trino warehouses). ORC is a first-class Spark format:
    predicate pushdown, column pruning and vectorized reads all apply
    exactly as with parquet, so the engine's scan-side plan
    guarantees carry over (pinned by tests/test_document_sources.py:
    the executedPlan of a filtered ORC read shows PushedFilters)."""
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(f"partition columns not in frame: {missing}")
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_corpus_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC corpus written by ``write_corpus_orc``."""
    return spark.read.orc(path)


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> None:
    """JSONL export sink — the interchange format crawl dumps arrive
    in and annotation/inspection tools consume. Round-trips through
    ``read_documents_jsonl`` (pinned by tests/test_urls_privacy.py).
    Every task writes its own (optionally gzipped) part files in
    parallel with the same per-file record bound as the parquet/ORC
    writers — no single-file funnel; a ``_corrupt`` column, if
    present from a quarantined read, is dropped rather than
    re-exported."""
    out = df.drop("_corrupt") if "_corrupt" in df.columns else df
    w = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
