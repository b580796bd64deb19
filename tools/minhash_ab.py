"""A/B: does checkpointing the slim `buckets` relation (doc x band
rows) stop the expensive signature pipeline (shingle explode + md5 +
min-agg over ~75M rows at 500k docs) from re-executing for each of
its three consumers (bucket-size count, join side A, join side B)?

Usage: python tools/minhash_ab.py [sf_dir] [factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rep = spark.range(factor).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(F.col("rep").cast("string"), F.lit("_"), F.col("text")).alias(
                "text"
            ),
        )
        .repartition(64)
        .localCheckpoint()
    )
    n = docs.count()
    print(f"corpus: {n} docs")

    from bubbles.operators.dedup import minhash_lsh_pairs

    # the checkpoint is now the shipped default; this harness remains
    # to re-measure the operator end-to-end after changes
    for rep in range(3):
        t0 = time.time()
        c = minhash_lsh_pairs(docs).count()
        print(f"rep {rep}: {time.time() - t0:7.2f}s  ({c} pairs)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
