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
