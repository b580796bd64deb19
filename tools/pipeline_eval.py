"""Measured QUALITY of the approximate pipeline operators — not just
plumbing correctness: MinHash-LSH near-dup recall/precision against
the exact n-gram Jaccard ground truth, and ANN (LSH / IVF) recall@k
against brute-force cosine, on the real documents/embeddings tables.

Writes PIPELINE_EVAL.json. Usage:
  python tools/pipeline_eval.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "PIPELINE_EVAL.json"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf_dir": sf_dir}

    # ---- near-dup: MinHash-LSH candidates vs exact Jaccard truth ----
    # ngram_jaccard_pairs is EXACT and complete for every pair sharing
    # >= 1 shingle — any pair at jaccard >= theta > 0 shares shingles,
    # so filtering it at theta IS the full ground truth.
    from bubbles.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    theta = 0.7
    # truth in the SAME shingle space MinHash signs (5-gram jaccard):
    # mixing spaces (3-gram truth vs 5-gram signatures) understates
    # recall for reasons that have nothing to do with LSH
    t0 = time.time()
    truth = {
        (int(r.id_a), int(r.id_b))
        for r in ngram_jaccard_pairs(docs, threshold=theta, n=5).collect()
    }
    t_truth = round(time.time() - t0, 2)
    cand_true = {
        (int(r.id_a), int(r.id_b))
        for r in ngram_jaccard_pairs(docs, threshold=0.5, n=5).collect()
    }
    results["near_dup"] = {"theta_truth": theta, "n_truth_pairs": len(truth)}
    # the num_hashes knob: 8 (the oracle-pinned cheap default; 2 bands
    # of 4 -> theoretical detection 1-(1-s^4)^2 = 0.42 at s=0.7) vs 32
    # (8 bands -> 0.89 at s=0.7, 0.99 at s=0.8) — production recall
    # needs the bigger signature; the s-curve is the price of cheap
    for nh in (8, 32):
        t0 = time.time()
        cand = {
            (int(r.id_a), int(r.id_b))
            for r in minhash_lsh_pairs(docs, num_hashes=nh).collect()
        }
        el = round(time.time() - t0, 2)
        results["near_dup"][f"num_hashes={nh}"] = {
            "n_candidates": len(cand),
            "recall_at_theta": round(len(truth & cand) / max(len(truth), 1), 4),
            "candidate_precision_at_0.5": round(
                len(cand & cand_true) / max(len(cand), 1), 4
            ),
            "sec_lsh": el,
        }
    results["near_dup"]["sec_exact_truth"] = t_truth
    print(json.dumps(results["near_dup"]), flush=True)

    # ---- ANN recall@k vs brute-force cosine ----
    from bubbles.operators.similarity import cosine_topk, ivf_topk, lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    k = 10
    t0 = time.time()
    brute = cosine_topk(emb, emb, k=k).collect()
    t_brute = round(time.time() - t0, 2)
    truth_nn = {}
    for r in brute:
        truth_nn.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))

    def recall(rows, qcol, ncol):
        got = {}
        for r in rows:
            got.setdefault(int(r[qcol]), set()).add(int(r[ncol]))
        num = sum(len(truth_nn[q] & got.get(q, set())) for q in truth_nn)
        den = sum(len(truth_nn[q]) for q in truth_nn)
        return round(num / max(den, 1), 4)

    t0 = time.time()
    lsh = lsh_topk(emb, k=k, dim=64).collect()
    t_ann_lsh = round(time.time() - t0, 2)
    t0 = time.time()
    lsh_mp = lsh_topk(emb, k=k, dim=64, n_probes=8).collect()
    t_ann_lsh_mp = round(time.time() - t0, 2)
    # same total probe budget (tables*8), allocated across tables by
    # global perturbation-score order over 1- and 2-bit flips (Lv et
    # al. query-directed allocation): per-table probing saturates the
    # single-bit Hamming ball at planes+1 buckets/table, which an
    # 8-probe budget already exhausts at the auto-sized planes=6
    t0 = time.time()
    lsh_mpg = lsh_topk(
        emb, k=k, dim=64, n_probes=8, probe_alloc="global"
    ).collect()
    t_ann_lsh_mpg = round(time.time() - t0, 2)
    # double the budget: past the single-bit wall the 2-bit masks
    # keep buying recall
    t0 = time.time()
    lsh_mpg16 = lsh_topk(
        emb, k=k, dim=64, n_probes=16, probe_alloc="global"
    ).collect()
    t_ann_lsh_mpg16 = round(time.time() - t0, 2)
    n_cent = max(16, int((n_vec / 200) ** 0.5) ** 2)
    t0 = time.time()
    ivf = ivf_topk(emb, k=k, n_centroids=n_cent, n_probe=8, n_rows=n_vec).collect()
    t_ivf = round(time.time() - t0, 2)
    results["ann"] = {
        "n_vectors": int(n_vec),
        "k": k,
        "lsh_recall": recall(lsh, "query_id", "neighbor_id"),
        "lsh_multiprobe8_recall": recall(lsh_mp, "query_id", "neighbor_id"),
        "lsh_multiprobe8_global_recall": recall(
            lsh_mpg, "query_id", "neighbor_id"
        ),
        "lsh_multiprobe16_global_recall": recall(
            lsh_mpg16, "query_id", "neighbor_id"
        ),
        "ivf_recall": recall(ivf, "query_id", "neighbor_id"),
        "sec_brute": t_brute,
        "sec_lsh": t_ann_lsh,
        "sec_lsh_multiprobe8": t_ann_lsh_mp,
        "sec_lsh_multiprobe8_global": t_ann_lsh_mpg,
        "sec_lsh_multiprobe16_global": t_ann_lsh_mpg16,
        "sec_ivf": t_ivf,
        "note": (
            "embeddings are barely separable by construction "
            "(between-centroid 0.2 vs within-spread 0.99, TESTDATA.md) — "
            "a hard ANN instance; recall here is the floor, not the "
            "ceiling. n_probes=8 per-table multi-probe lifts LSH recall "
            "0.14 -> 0.55 and saturates there (all planes+1 single-bit "
            "buckets probed); probe_alloc='global' (1+2-bit flips, "
            "budget allocated across tables by margin) reaches 0.61 at "
            "the same budget and 0.84 at n_probes=16 — past IVF's 0.72 "
            "at comparable wall time."
        ),
    }
    print(json.dumps(results["ann"]), flush=True)

    # ---- ANN recall on a SEPARABLE corpus (round 9): the fixture
    # above is deliberately near-inseparable (recall floor); this
    # seeded clustered mixture is what a typical trained embedding
    # space looks like, so a user can read absolute recall AND which
    # index to pick. Same sizes, same variants, matched wall time.
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(42)
    n_cl = 25
    centers = rng.standard_normal((n_cl, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    Xs = centers[rng.integers(0, n_cl, n_vec)] + 0.15 * rng.standard_normal(
        (n_vec, 64)
    )
    Xs /= np.linalg.norm(Xs, axis=1, keepdims=True)
    emb_sep = spark.createDataFrame(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec), pa.int64()),
                "embedding": pa.array(
                    Xs.tolist(), pa.list_(pa.float64())
                ),
            }
        )
    ).localCheckpoint()
    t0 = time.time()
    brute_s = cosine_topk(emb_sep, emb_sep, k=k).collect()
    ts_brute = round(time.time() - t0, 2)
    truth_sep: dict = {}
    for r in brute_s:
        truth_sep.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))

    def recall_sep(rows):
        got: dict = {}
        for r in rows:
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        num = sum(len(truth_sep[q] & got.get(q, set())) for q in truth_sep)
        den = sum(len(truth_sep[q]) for q in truth_sep)
        return round(num / max(den, 1), 4)

    sep: dict = {"n_vectors": int(n_vec), "k": k, "sec_brute": ts_brute}
    for name, kw in (
        ("lsh", {}),
        ("lsh_multiprobe8", {"n_probes": 8}),
        ("lsh_multiprobe8_global", {"n_probes": 8, "probe_alloc": "global"}),
        ("lsh_multiprobe16_global", {"n_probes": 16, "probe_alloc": "global"}),
    ):
        t0 = time.time()
        rows = lsh_topk(emb_sep, k=k, dim=64, **kw).collect()
        sep[f"{name}_recall"] = recall_sep(rows)
        sep[f"sec_{name}"] = round(time.time() - t0, 2)
    t0 = time.time()
    rows = ivf_topk(
        emb_sep, k=k, n_centroids=n_cent, n_probe=8, n_rows=n_vec
    ).collect()
    sep["ivf_recall"] = recall_sep(rows)
    sep["sec_ivf"] = round(time.time() - t0, 2)
    sep["note"] = (
        "seeded 25-cluster unit-norm mixture (within-cluster noise "
        "0.15) at the fixture's size — the separable complement to "
        "the hard corpus above; read this row for absolute recall on "
        "realistic embedding geometry and the hard row for the "
        "degradation floor."
    )
    results["ann_separable"] = sep
    print(json.dumps(results["ann_separable"]), flush=True)

    # ---- int8 quantization fidelity: brute-force top-k on the
    # DEQUANTIZED vectors vs the exact-float ground truth ----
    from pyspark.sql import functions as F

    from bubbles.operators.quantize import dequantize_expr, quantize_embeddings

    t0 = time.time()
    deq = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(quantize_embeddings(emb), "vec_id")
        .select(
            "vec_id",
            dequantize_expr(F.col("codes"), F.col("scale")).alias("embedding"),
        )
    )
    qrows = cosine_topk(deq, deq, k=k).collect()
    t_q = round(time.time() - t0, 2)
    results["quantization"] = {
        "bits": 8,
        "recall_vs_exact": recall(qrows, "query_id", "neighbor_id"),
        "sec_quantize_plus_brute": t_q,
        "note": (
            "recall of exact top-10 when ALL vectors are int8-quantized "
            "then dequantized — the storage-compression fidelity number "
            "(4-8x size cut); same barely-separable corpus caveat as ann."
        ),
    }
    print(json.dumps(results["quantization"]), flush=True)

    # ---- sketch accuracy: KMV distinct / overlap and sampled
    # quantiles vs EXACT answers on the real documents table ----
    from bubbles.operators.sketch import (
        kmv_distinct,
        kmv_overlap,
        sampled_quantiles,
    )

    t0 = time.time()
    exact_d = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.count_distinct("text").alias("n"))
        .collect()
    }
    est_d = {
        r["lang"]: r["est_distinct"]
        for r in kmv_distinct(docs, "lang", "text", k=64).collect()
    }
    derrs = [abs(est_d[g] - exact_d[g]) / exact_d[g] for g in exact_d]

    rel_a = docs.filter(F.pmod("doc_id", F.lit(3)) != 0)
    rel_b = docs.filter(F.pmod("doc_id", F.lit(3)) != 1)
    est_j = {
        r["lang"]: r["jaccard_ppm"] / 1e6
        for r in kmv_overlap(rel_a, rel_b, "lang", "text", k=64).collect()
    }
    ta = rel_a.select("lang", "text").distinct()
    tb = rel_b.select("lang", "text").distinct()
    inter_map = {
        x["lang"]: x["count"]
        for x in ta.intersect(tb).groupBy("lang").count().collect()
    }
    exact_j = {
        u["lang"]: inter_map.get(u["lang"], 0) / u["count"]
        for u in ta.union(tb).distinct().groupBy("lang").count().collect()
    }
    jerrs = [abs(est_j[g] - exact_j[g]) for g in exact_j]

    qs = sampled_quantiles(
        docs.select("lang", "doc_id", F.length("text").alias("len")),
        "lang",
        "doc_id",
        "len",
        qs_ppm=[500_000, 990_000],
        k=256,
    ).collect()
    # rank error: |F_exact(est) - q| — the fraction of the group the
    # estimate is displaced by (the number a quantile sketch quotes)
    lens = docs.select("lang", F.length("text").alias("len")).collect()
    bylang: dict = {}
    for r in lens:
        bylang.setdefault(r["lang"], []).append(r["len"])
    for g in bylang:
        bylang[g].sort()
    import bisect

    qerrs = []
    for r in qs:
        arr = bylang[r["lang"]]
        rank = bisect.bisect_right(arr, r["value"]) / len(arr)
        qerrs.append(abs(rank - r["q_ppm"] / 1e6))
    results["sketch_accuracy"] = {
        "kmv_distinct_k64_max_rel_err": round(max(derrs), 4),
        "kmv_overlap_k64_max_abs_jaccard_err": round(max(jerrs), 4),
        "sampled_quantiles_k256_max_rank_err": round(max(qerrs), 4),
        "n_groups": len(exact_d),
        "sec": round(time.time() - t0, 2),
        "note": (
            "measured vs exact on the real documents table; k chosen "
            "BELOW the group cardinalities so the ESTIMATOR path is "
            "what is scored (k=64: rel error bound ~1/sqrt(62)=0.127; "
            "k=256 quantile rank error ~sqrt(q(1-q)/k)<=0.031)"
        ),
    }
    print(json.dumps(results["sketch_accuracy"]), flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
