"""Scaling evidence for the pipeline operators: replicate the real
documents table Nx (id-offset copies, so content distribution and
dup structure are preserved) and measure the headline text/dedup
operators at 1x / 10x / 100x. Linear wall-clock growth here is the
measured backing for SCALE.md's 100 TB claims — a super-linear op
would show up immediately.

Usage: python tools/pipeline_scale.py [sf_dir] [factors...]
Writes SCALEBENCH.json {op: {n_docs: seconds}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 10, 100]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # SCALE_PARTITIONS overrides the shuffle width: partitions must
    # scale with data (the repo's own 100 TB rule — "size
    # spark.sql.shuffle.partitions so partitions fit in executor
    # memory"); a fixed 32 under a 1000x replication pushes ~40M
    # exploded shingle rows through each partition. Measured on
    # stream_near_dup at 5M docs the width barely moved the needle
    # on this box (1456 s at 32 vs 1518 s at 256, same day) — the
    # single-JVM shuffle spills to the same local disk either way —
    # but on a real cluster the width picks how many machines absorb
    # the explode, so big factors should still scale it.
    shuffle_parts = os.environ.get("SCALE_PARTITIONS", "32")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_base = base.count()

    def corpus(factor: int):
        if factor == 1:
            return base, n_base
        rep = spark.range(factor).select(F.col("id").alias("rep"))
        # prefix every token with "<rep>_": shingle/token sets inside
        # one replica keep the original similarity structure (both
        # docs get the same prefix on shared tokens) while cross-rep
        # similarity collapses — dup-cluster SIZE stays constant as
        # the corpus grows, which is what real corpora do. A naive
        # verbatim copy makes every doc a 100-way exact dup: a
        # degenerate corpus where every LSH bucket trips the skew cap.
        perturbed = F.regexp_replace(
            F.col("text"),
            F.lit(r"(^|\s)"),
            F.concat(F.lit("$1"), F.col("rep").cast("string"), F.lit("_")),
        )
        df = base.crossJoin(rep).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            perturbed.alias("text"),
            "source",
        )
        # materialize once so op timings don't include the replication
        df = df.repartition(64).localCheckpoint()
        return df, n_base * factor

    from bubbles.operators.dedup import (
        bloom_new_documents,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from bubbles.operators.search import keyword_search
    from bubbles.operators.splits import pack_sequences
    from bubbles.operators.text import repetition_profile, winnow_fingerprints

    def run(df):
        # noop sink: forces FULL evaluation of every output column —
        # .count() on a pure projection lets Catalyst prune the
        # measured expressions away entirely
        df.write.format("noop").mode("overwrite").save()
        return "-"

    OPS = {
        "exact_dedup": lambda d, n: run(exact_dedup(d)),
        # 80/20 corpus/batch split by doc_id; bitmap sized ~16 bits/doc
        # (power of two) so fpp stays comparable across factors
        "bloom_incremental_dedup": lambda d, n: run(
            bloom_new_documents(
                d.filter(F.pmod("doc_id", F.lit(10)) < 8),
                d.filter(F.pmod("doc_id", F.lit(10)) >= 8),
                n_bits=1 << max(16, (16 * n - 1).bit_length()),
            )
        ),
        "minhash_lsh_pairs": lambda d, n: run(minhash_lsh_pairs(d)),
        "winnow_fingerprints": lambda d, n: run(winnow_fingerprints(d)),
        "keyword_search": lambda d, n: run(
            keyword_search(d, ["hash", "join", "vector"])
        ),
        "repetition_profile": lambda d, n: run(repetition_profile(d)),
        # n_docs threaded (known from the replication factor) so the
        # SIZE-DERIVED stream width is exercised without a count job
        "pack_sequences": lambda d, n: run(
            pack_sequences(
                d.select(
                    "doc_id",
                    F.size(F.split(F.lower("text"), r"\s+"))
                    .cast("long")
                    .alias("n_tokens"),
                ),
                max_tokens=512,
                n_docs=n,
            )
        ),
    }

    from bubbles.operators.splits import curriculum_buckets

    OPS["curriculum_buckets"] = lambda d, n: run(
        curriculum_buckets(d, n_buckets=10)
    )

    from bubbles.operators.text import segment_dedup

    OPS["segment_dedup"] = lambda d, n: run(
        segment_dedup(d, min_docs=2, tokens_per_segment=16)
    )

    from bubbles.operators.cdc import merge_upsert
    from bubbles.operators.chunking import chunk_documents
    from bubbles.operators.profile import profile_columns
    from bubbles.operators.sketch import kmv_distinct

    OPS["profile_columns"] = lambda d, n: run(
        profile_columns(d, ["doc_id", "text", "source"])
    )
    # texts are all distinct after replication-perturbation, so the
    # sketch's bottom-k sees the full n/|sources| cardinality pressure
    OPS["kmv_distinct"] = lambda d, n: run(
        kmv_distinct(d, "source", "text", k=256)
    )
    OPS["chunk_documents"] = lambda d, n: run(
        chunk_documents(d, chunk_tokens=64, overlap_tokens=16)
    )

    from bubbles.operators.text import substring_dedup

    OPS["substring_dedup"] = lambda d, n: run(
        substring_dedup(d, gram_tokens=8, min_count=2)
    )

    from bubbles.operators.text import collocations

    OPS["collocations"] = lambda d, n: run(
        collocations(d, min_count=5, top_k=20)
    )

    from bubbles.operators.search import inverted_index

    # max_postings=100: the synthetic vocab is tiny (~31 terms), so
    # every term is a "stopword" — the worst case the salted cap
    # exists for (posting lists = n/31 docs each)
    OPS["inverted_index"] = lambda d, n: run(
        inverted_index(d, max_postings=100)
    )

    def _merge(d, n):
        changes = (
            d.filter(F.pmod("doc_id", F.lit(5)) < 2)
            .withColumn(
                "op",
                F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("delete"))
                .otherwise(F.lit("upsert")),
            )
            .withColumn("seq", F.lit(1).cast("long"))
        )
        return run(merge_upsert(d, changes))

    OPS["merge_upsert"] = _merge

    from bubbles.operators.layout import compaction_plan, zorder_key
    from bubbles.operators.profile import key_skew_profile
    from bubbles.operators.sketch import kmv_overlap, sampled_quantiles

    # round-6 second-pass ops. kmv_overlap: two 2/3 overlapping
    # releases; all texts distinct post-perturbation so both side
    # sketches and the union run at full cardinality pressure.
    OPS["kmv_overlap"] = lambda d, n: run(
        kmv_overlap(
            d.filter(F.pmod("doc_id", F.lit(3)) != 0),
            d.filter(F.pmod("doc_id", F.lit(3)) != 1),
            "source",
            "text",
            k=256,
        )
    )
    OPS["sampled_quantiles"] = lambda d, n: run(
        sampled_quantiles(
            d.select("source", "doc_id", F.length("text").alias("len")),
            "source",
            "doc_id",
            "len",
            k=1024,
        )
    )
    OPS["key_skew_profile"] = lambda d, n: run(key_skew_profile(d, "source"))
    # compaction: ~10 table partitions -> each window partition holds
    # n/10 inventory rows; the one op here whose per-partition work
    # grows with n by design (file inventories are metadata-scale)
    OPS["compaction_plan"] = lambda d, n: run(
        compaction_plan(
            d.select("source", "doc_id", F.length("text").alias("sz")),
            "source",
            "doc_id",
            "sz",
            target_bytes=1 << 20,
        )
    )
    OPS["zorder_key"] = lambda d, n: run(
        zorder_key(
            d.select(
                "doc_id",
                F.pmod(F.xxhash64("doc_id"), F.lit(1 << 16)).alias("x"),
                F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1 << 16)).alias("y"),
            ),
            "x",
            "y",
        )
    )

    from bubbles.streaming.neardup import (
        corpus_band_index,
        stream_near_dup_candidates,
    )

    # round-7 streaming near-dup: measured on its batch twin plan
    # (identical physical shape to one micro-batch — per-row stateless
    # signatures + index build + one equi-join probe); 80/20
    # corpus/stream split like bloom_incremental_dedup
    OPS["stream_near_dup"] = lambda d, n: run(
        stream_near_dup_candidates(
            d.filter(F.pmod("doc_id", F.lit(10)) >= 8),
            corpus_band_index(d.filter(F.pmod("doc_id", F.lit(10)) < 8)),
        )
    )

    # round-9 amortization split (VERDICT r8 task 8): the row above
    # re-shingles + re-signs the whole corpus every run; these two
    # split that into the ONE-TIME index build+persist (bucketed
    # parquet table) and the warm per-batch scoring of a FIXED batch
    # (the base replica's stream docs — constant size across factors)
    # against the loaded index. The per-batch term is what a
    # production crawl pays per micro-batch.
    from bubbles.streaming.neardup import (
        load_corpus_band_index,
        persist_corpus_band_index,
    )

    def _ndup_build(d, n):
        persist_corpus_band_index(
            d.filter(F.pmod("doc_id", F.lit(10)) < 8),
            "neardup_idx",
            n_buckets=max(8, min(256, n // 20_000)),
        )
        return "-"

    OPS["stream_near_dup_index_build"] = _ndup_build
    OPS["stream_near_dup_warm_batch"] = lambda d, n: run(
        stream_near_dup_candidates(
            d.filter(
                (F.pmod("doc_id", F.lit(10)) >= 8)
                & (F.col("doc_id") < 10_000_000)
            ),
            load_corpus_band_index(spark, "neardup_idx"),
        )
    )

    from bubbles.operators.dedup import semantic_dedup
    from bubbles.operators.kmeans import kmeans_fit
    from bubbles.operators.lm import bigram_lm_score

    OPS["bigram_lm_score"] = lambda d, n: run(
        bigram_lm_score(
            d.filter(F.pmod("doc_id", F.lit(10)) >= 8),
            d.filter(F.pmod("doc_id", F.lit(10)) < 8),
        )
    )

    # embeddings corpus: replicas shift by 10·rep along dimension
    # rep%64 — cross-rep geometry separates, so scaling n_centroids
    # with the factor (the SemDeDup/IVF design rule) keeps buckets
    # bounded the way a real growing corpus would
    emb_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_emb_base = emb_base.count()

    def emb_corpus(factor: int):
        if factor == 1:
            return emb_base, n_emb_base
        rep = spark.range(factor).select(F.col("id").alias("rep"))
        shifted = F.transform(
            F.col("embedding"),
            lambda x, i: x
            + F.when(
                i == F.pmod(F.col("rep"), F.lit(64)).cast("int"),
                (F.col("rep") * F.lit(10)).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        df = (
            emb_base.crossJoin(rep)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
                shifted.alias("embedding"),
            )
            .repartition(64)
            .localCheckpoint()
        )
        return df, n_emb_base * factor

    EMB_OPS = {
        # k ∝ corpus (target bucket ~125 rows), 2 Lloyd iterations
        "kmeans_fit": lambda d, n: run(
            kmeans_fit(d, k=max(16, n // 125), n_iter=2)
        ),
        "semantic_dedup": lambda d, n: run(
            semantic_dedup(d, threshold=0.25, n_centroids=max(16, n // 125))
        ),
    }

    import statistics

    # SCALE_OPS=a,b,c limits the measured ops (re-measure only what
    # changed); small factors take a median of 3 timed reps — the 1x
    # corpus is noise-dominated (JIT/GC swamp ~1 s absolute times and
    # single runs swing 3x run-to-run) — big factors stay single-rep.
    only = set(filter(None, os.environ.get("SCALE_OPS", "").split(",")))
    results: dict[str, dict[int, float]] = {op: {} for op in OPS}
    for factor in factors:
        df, n = corpus(factor)
        reps = 3 if factor < 100 else 1
        for op, thunk in OPS.items():
            if only and op not in only:
                continue
            thunk(df, n)  # warmup (JIT, shuffle-file reuse)
            runs = []
            for _ in range(reps):
                t0 = time.time()
                thunk(df, n)
                runs.append(round(time.time() - t0, 2))
            el = round(statistics.median(runs), 2)
            results[op][n] = el
            print(f"{op:22s} n={n:>8d}  {el:7.2f}s  median of {runs}", flush=True)
        df.unpersist() if factor > 1 else None
        if any(op in EMB_OPS for op in (only or EMB_OPS)):
            edf, en = emb_corpus(factor)
            for op, thunk in EMB_OPS.items():
                if only and op not in only:
                    continue
                thunk(edf, en)  # warmup
                runs = []
                for _ in range(reps):
                    t0 = time.time()
                    thunk(edf, en)
                    runs.append(round(time.time() - t0, 2))
                el = round(statistics.median(runs), 2)
                results.setdefault(op, {})[en] = el
                print(
                    f"{op:22s} n={en:>8d}  {el:7.2f}s  median of {runs}",
                    flush=True,
                )

    # merge with any existing record so factors can be re-run in
    # separate invocations without clobbering the others
    try:
        with open("SCALEBENCH.json") as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {}
    for op, pts in results.items():
        merged.setdefault(op, {}).update(
            {str(n): sec for n, sec in pts.items()}
        )
    with open("SCALEBENCH.json", "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote SCALEBENCH.json")
    spark.stop()


if __name__ == "__main__":
    main()
