"""Streaming near-duplicate detection against a static corpus index —
the in-flight crawl-dedup shape: documents arrive as a stream, the
historical corpus is a prebuilt (band, bucket) MinHash index, and each
micro-batch flags its near-dup candidates through one stream-static
equi-join.

Two design points make this run UNBOUNDED with zero streaming state:

* **Per-row (stateless) MinHash.** The batch signature
  (operators/dedup.minhash_signatures) explodes shingles and
  groupBy-aggregates lane minima — on a stream that is a stateful
  aggregation with per-doc state. Here each signature lane is an
  ``array_min`` over a ``transform`` of the in-row shingle array:
  pure projection, bit-identical minima (same md5 lanes over the same
  distinct shingles), no state store. The batch path keeps the
  explode+agg shape because it map-side-combines; a stream cannot and
  should not.
* **Stream-static join.** The corpus index is a bounded static
  DataFrame (one row per corpus doc per band, over-common buckets
  capped away exactly like ``minhash_lsh_pairs``); Spark re-plans the
  static side per micro-batch, so index refreshes (rebuild the parquet
  the index reads) are picked up without restarting the query.

At 100 TB: the stream side shuffles nothing (projection + join probe);
the static index is (corpus_docs × bands) slim rows — equi-join keyed
on (band, bucket), AQE-owned strategy, no state store growth over
time. The candidate output is append-mode per micro-batch; exact
verification (ngram_similarity_join) stays a bounded batch job over
the day's candidates, as in incremental_dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bubbles.operators.text import char_ngrams


def _stage_rowwise_minhash(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle: int,
) -> tuple[DataFrame, list[Column]]:
    """Stateless MinHash lanes: min over the distinct in-row shingle
    set of 8-hex-char md5 lanes — identical values to
    ``operators.dedup.minhash_signatures`` (same salts, same lanes),
    computed per row instead of via explode + groupBy.

    Returns (staged_df, lane_columns). The digests are materialized
    ONCE per salt in a staging projection (one md5 per shingle per
    salt = ceil(num_hashes/4) total, same as the batch path); the four
    lanes per salt are cheap substring minima over the staged arrays —
    without the stage, each lane's higher-order transform would
    re-evaluate the full md5, 4x the dominant per-row CPU cost.

    Rows with NO shingles (NULL text or shorter than ``shingle``) are
    dropped here, mirroring the batch path where explode produces
    nothing for them — otherwise every such row would land in the
    md5-of-empty sentinel bucket and near-dup-match every other short
    row."""
    grams = F.array_distinct(char_ngrams(F.col(text_col), shingle))
    n_salts = (num_hashes + 3) // 4

    def salted_md5(salt: int):
        # factory closure: a pyspark higher-order lambda must take
        # ONLY its lambda variables — extra/default params are rejected
        if salt == 0:
            return lambda g: F.md5(g)
        pre = F.lit(f"{salt}|")
        return lambda g: F.md5(F.concat(pre, g))

    dig_cols = [
        F.transform(grams, salted_md5(s)).alias(f"__digs{s}")
        for s in range(n_salts)
    ]
    staged = docs.where(F.size(grams) > 0).select(F.col(id_col), *dig_cols)

    def lane_min(salt: int, lane: int) -> Column:
        off = lane * 8

        def sub(d):
            return F.substring(d, off + 1, 8)

        return F.array_min(F.transform(F.col(f"__digs{salt}"), sub))

    return staged, [lane_min(*divmod(i, 4)) for i in range(num_hashes)]


def _band_hashes(mh: list[Column], band_size: int) -> Column:
    n_bands = len(mh) // band_size
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[mh[b * band_size + j] for j in range(band_size)]
                )
            )
            for b in range(n_bands)
        ]
    )


def corpus_band_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 4,
    shingle: int = 5,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Static (band, bucket, corpus_id) MinHash LSH index over the
    historical corpus — build once (or per refresh), persist as
    parquet, hand to ``stream_near_dup_candidates``. Reuses the batch
    signature pipeline (explode + map-side-combined lane minima) and
    the same over-common-bucket cap as ``minhash_lsh_pairs``: a bucket
    shared by more than ``max_bucket_size`` corpus docs is boilerplate
    and would fan every matching stream row out by its full size."""
    from bubbles.operators.dedup import band_buckets, minhash_signatures

    par = corpus.sparkSession.sparkContext.defaultParallelism
    sig = minhash_signatures(
        corpus.repartition(par), text_col, id_col, num_hashes, shingle
    )
    # checkpoint the slim (id, band, bucket) relation before the cap:
    # the cap's count branch and the join branch are two consumers, so
    # without it the whole shingle-explode + digest + aggregate
    # pipeline runs TWICE per build — the same 3x recompute
    # minhash_lsh_pairs measured and fixed (operators/dedup.py); the
    # checkpointed relation is 2 rows/doc, tiny next to the explode
    buckets = band_buckets(
        sig, num_hashes, band_size, max_bucket_size, id_col,
        checkpoint=True,
    )
    return buckets.select(
        "band", "bucket", F.col(id_col).alias("corpus_id")
    )


def persist_corpus_band_index(
    corpus: DataFrame,
    table: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 4,
    shingle: int = 5,
    max_bucket_size: int = 64,
) -> None:
    """Build the corpus band index ONCE and persist it as a BUCKETED
    parquet table (sources/bucketed.py layout), so per-batch scoring
    never re-shingles or re-signs the historical corpus — the
    amortization that matters when the corpus is 1000× the daily
    stream. The composite join key is flattened to one column
    ``bkey = band|bucket`` and the table is bucketed + sorted on it:
    the stream-static equi-join then reads the corpus side already
    co-located (no per-micro-batch Exchange/Sort of the index; only
    the tiny stream side shuffles). Refresh = rerun this (the
    stream-static join re-plans the static side per micro-batch, so a
    rebuilt table is picked up without restarting the query)."""
    from bubbles.sources.bucketed import write_bucketed

    spark = corpus.sparkSession
    # refresh semantics: a NEW session does not know the previous
    # session's managed table, so its orphaned warehouse location
    # would fail the write with LOCATION_ALREADY_EXISTS — drop both
    # the catalog entry and the location (Hadoop FS API: works on any
    # filesystem, not just local)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if "." not in table:
        jvm = spark.sparkContext._jvm
        loc = jvm.org.apache.hadoop.fs.Path(
            f"{spark.conf.get('spark.sql.warehouse.dir')}/{table}"
        )
        fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(loc):
            # only reclaim a location that LOOKS like a previous write
            # of this index (a parquet table dir: parquet part files
            # or a _SUCCESS marker at its top level) — a colliding
            # directory of unrelated data parked under the warehouse
            # must not be silently destroyed (ADVICE r9)
            entries = fs.listStatus(loc)
            # empty dir / dangling _temporary = an interrupted previous
            # write: nothing to lose, reclaim it
            looks_like_index = len(entries) == 0
            for st in entries:
                nm = st.getPath().getName()
                if (
                    nm == "_SUCCESS"
                    or nm == "_temporary"
                    or (nm.startswith("part-") and ".parquet" in nm)
                ):
                    looks_like_index = True
                    break
            if not looks_like_index:
                raise ValueError(
                    f"refusing to overwrite {loc}: the directory exists "
                    f"but does not look like a previous band-index write "
                    f"(no parquet part files / _SUCCESS at its top "
                    f"level); move it aside or pick another table name"
                )
            fs.delete(loc, True)
    idx = corpus_band_index(
        corpus, text_col, id_col, num_hashes, band_size, shingle,
        max_bucket_size,
    ).withColumn(
        "bkey", F.concat_ws("|", F.col("band").cast("string"), "bucket")
    )
    write_bucketed(idx, table, "bkey", n_buckets)


def load_corpus_band_index(spark, table: str) -> DataFrame:
    """The warm-index side for ``stream_near_dup_candidates`` — the
    bucketed table persisted by ``persist_corpus_band_index``."""
    return spark.table(table)


def stream_near_dup_candidates(
    docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """(doc_id, corpus_id, band) candidate near-dup matches of a
    document stream against a static corpus index. Stateless: per-row
    signatures (projection) + posexplode + one stream-static equi-join
    on (band, bucket) — works identically on a batch ``docs`` frame
    (the oracle twin runs exactly that). An index carrying the
    persisted layout's ``bkey`` column joins on that single key
    instead (same pairs; lets the bucketed table satisfy the join's
    distribution with zero Exchange on the corpus side)."""
    staged, mh = _stage_rowwise_minhash(
        docs, text_col, id_col, num_hashes, shingle
    )
    probes = staged.select(
        F.col(id_col),
        F.posexplode(_band_hashes(mh, band_size)).alias("band", "bucket"),
    )
    if "bkey" in index.columns:
        probes = probes.withColumn(
            "bkey", F.concat_ws("|", F.col("band").cast("string"), "bucket")
        )
        return probes.join(
            index.select("bkey", "corpus_id"), on="bkey"
        ).select(F.col(id_col), "corpus_id", "band")
    return probes.join(index, on=["band", "bucket"]).select(
        F.col(id_col), "corpus_id", "band"
    )


def run_stream_near_dup_to_memory(
    spark,
    sf_dir: str,
    name: str = "neardup_out",
    num_hashes: int = 8,
    band_size: int = 4,
):
    """Local smoke path: corpus = documents with doc_id%10 < 8, stream
    = the documents parquet replayed as a file-source stream filtered
    to doc_id%10 >= 8 (the incremental_dedup split), candidates to a
    memory sink."""
    import pyarrow.parquet as pq

    schema_cols = pq.read_schema(f"{sf_dir}/documents.parquet").names
    ddl = ", ".join(
        {
            "doc_id": "doc_id long",
            "text": "text string",
            "lang": "lang string",
            "source": "source string",
            "n_chars": "n_chars long",
        }.get(c, f"{c} string")
        for c in schema_cols
    )
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.pmod(F.col("doc_id"), F.lit(10)) < 8
    )
    index = corpus_band_index(corpus, num_hashes=num_hashes, band_size=band_size)
    stream = (
        spark.readStream.schema(ddl)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 8)
    )
    from bubbles.streaming.events import _drive_to_memory

    return _drive_to_memory(
        spark,
        stream_near_dup_candidates(
            stream, index, num_hashes=num_hashes, band_size=band_size
        ),
        "append",
        name,
    )
