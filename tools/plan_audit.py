"""Physical-plan audit: verify Catalyst properties we rely on at
scale — predicate pushdown into parquet, column pruning, broadcast
joins for small sides, whole-stage codegen coverage, no redundant
exchanges. Writes PLANS.md.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    checks = []

    def check(name, cond, detail):
        checks.append((name, bool(cond), detail))

    # 1. q1: filter pushed to parquet scan + pruned columns
    q1 = m.all_queries()["q1_pricing_summary"](spark, sf_dir)
    p = plan_of(q1)
    check(
        "q1 filter pushdown",
        "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p,
        "shipdate predicate reaches the parquet scan",
    )
    sel = re.search(r"FileScan parquet \[([^\]]*)\]", p)
    ncols = len(sel.group(1).split(",")) if sel else 99
    check(
        "q1 column pruning",
        ncols <= 7,
        f"scan reads {ncols} of 11 lineitem columns",
    )
    check(
        "q1 partial aggregation",
        "HashAggregate" in p and p.count("HashAggregate") >= 2,
        "partial+final hash aggregate",
    )
    # codegen markers (*(n)) only appear in the AQE-final plan
    q1.collect()
    p_final = plan_of(q1)
    check(
        "q1 codegen",
        "*(" in p_final or "WholeStageCodegen" in p_final,
        "whole-stage codegen spans in the AQE-final plan",
    )

    # 2. j2: dimension joins are broadcast, fact side never shuffled
    #    before the aggregate
    j2 = m.all_queries()["j2_model_lookup"](spark, sf_dir)
    p = plan_of(j2)
    check(
        "j2 broadcast joins",
        p.count("BroadcastHashJoin") == 2 and "SortMergeJoin" not in p,
        "supplier and nation both broadcast; no sort-merge join",
    )

    # 3. j1 nearest-representative: sample side broadcast; point side
    #    has ZERO exchanges (argmin is a projection)
    from bubbles.operators.nearest import nearest_representative
    from bubbles.operators.sampling import stratified_sample_exact

    pts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.monotonically_increasing_id().alias("point_id"),
            F.array("l_quantity", "l_discount").cast("array<double>").alias("features"),
        )
        .withColumn("subset_id", F.col("point_id") % 4)
    )
    reps = stratified_sample_exact(pts, "subset_id", 0.01)
    p = plan_of(nearest_representative(pts, reps))
    big_side = p.split("BroadcastExchange")[0]
    check(
        "j1 zero-shuffle argmin",
        "BroadcastHashJoin" in p
        and "Exchange hashpartitioning" not in big_side,
        "points flow scan→project→broadcast-join→project, no exchange",
    )

    # 4. p6/p7: semi/anti joins stay broadcast at this scale
    p = plan_of(m.all_queries()["p6_semi_join"](spark, sf_dir))
    check("p6 semi join", "LeftSemi" in p, "left-semi join planned")
    p = plan_of(m.all_queries()["p7_anti_join"](spark, sf_dir))
    check("p7 anti join", "LeftAnti" in p, "left-anti join planned")

    # 5. dedup_exact: single hash aggregate with partial side
    p = plan_of(m.all_queries()["dedup_exact"](spark, sf_dir))
    check(
        "dedup_exact partial agg",
        p.count("HashAggregate") >= 2,
        "map-side partial aggregation on md5 key",
    )

    # 6. bubble aggregation: hash aggregate (not sort) + single shuffle
    from bubbles.operators.bubble_agg import bubble_aggregate

    assigned = pts.withColumn("bubble_id", F.col("point_id") % 100)
    p = plan_of(bubble_aggregate(assigned, dim=2))
    check(
        "a2 hash aggregate",
        "HashAggregate" in p and "SortAggregate" not in p,
        "per-dimension sums hash-aggregate; no sort aggregate",
    )
    check(
        "a2 single shuffle",
        p.count("Exchange hashpartitioning") == 1,
        "exactly one exchange (on the group key)",
    )

    # 7. w1 top-k: single shuffle then windowed rank
    p = plan_of(m.all_queries()["w1_topk_per_group"](spark, sf_dir))
    check(
        "w1 single shuffle window",
        p.count("Exchange hashpartitioning") == 1,
        "one exchange for the window partition",
    )

    # 8. IVF inverted-list cap: the unbounded-input pre-rank window
    # partitions on (key, salt) so a hot centroid can't concentrate
    # its whole list in one window partition
    from bubbles.operators.similarity import _salted_topk_per_key

    capped = _salted_topk_per_key(
        assigned.select(
            F.col("bubble_id").alias("centroid"),
            F.col("point_id").alias("neighbor_id"),
            F.col("point_id").cast("double").alias("rep_dist"),
        ),
        "centroid",
        ["rep_dist", "neighbor_id"],
        100,
    )
    p = plan_of(capped)
    check(
        "ivf salted cap",
        "__salt" in p and p.count("windowspecdefinition") == 2,
        "two-phase top-k: salted pre-rank (plus Spark's own partial "
        "WindowGroupLimit) bounds the per-key window input",
    )

    # 9. LSH ANN: candidates come from equi-joins on bucket signatures,
    # never a cartesian product
    p = plan_of(m.all_queries()["lsh_ann_topk"](spark, sf_dir))
    check(
        "lsh no cartesian",
        "CartesianProduct" not in p,
        "bucket equi-joins only; no cross join in the candidate stage",
    )

    # 9b. ANN bucket scoring: candidates are scored inside a cogroup
    # kernel emitting slim top-k rows — never a join materializing
    # (query, member) vector pairs (SCALE.md ANN note)
    p_lsh = plan_of(m.all_queries()["lsh_ann_topk"](spark, sf_dir))
    p_ivf = plan_of(m.all_queries()["ivf_ann_topk"](spark, sf_dir))
    check(
        "ann cogroup scoring",
        "FlatMapCoGroupsInPandas" in p_lsh and "FlatMapCoGroupsInPandas" in p_ivf,
        "LSH and IVF buckets score in a cogroup kernel; no vector-pair join",
    )

    # 9c. multi-probe LSH (round 7): the probe expansion must stay a
    # pure projection + explode — no UDF, no extra join, no cartesian;
    # scoring still flows through the cogroup kernel
    from bubbles.operators.similarity import lsh_topk as _lsh_topk

    emb_mp = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p_mp = plan_of(_lsh_topk(emb_mp, k=3, dim=64, planes=8, n_probes=4))
    check(
        "lsh multi-probe projection-only expansion",
        "CartesianProduct" not in p_mp
        and "BatchEvalPython" not in p_mp
        and "Generate explode" in p_mp
        and "FlatMapCoGroupsInPandas" in p_mp,
        "probe buckets from array_sort+XOR column expressions exploded "
        "in the projection; candidates still score in the cogroup kernel",
    )

    # 10. sessionize: the gap/session derivation runs its windows over
    # ONE user_id exchange — adding session stats must not re-shuffle
    p = plan_of(m.all_queries()["events_sessionize"](spark, sf_dir))
    check(
        "sessionize single shuffle",
        p.count("Exchange hashpartitioning") == 1,
        "lag/gap/session-id windows share one user_id exchange",
    )

    # 11. as-of join: union + struct forward-fill — no join operator at
    # all, ONE exchange on the partition key
    p = plan_of(m.all_queries()["events_asof_join"](spark, sf_dir))
    check(
        "asof no join operator",
        "Join" not in p and p.count("Exchange hashpartitioning") == 1,
        "union + last() forward-fill over one key exchange; no join, no cartesian",
    )

    # 12. SimHash canonicalization: bucket minima via groupBy, never a
    # window — a mega-bucket of near-identical docs must not serialize
    # into one window partition
    p = plan_of(m.all_queries()["dedup_simhash"](spark, sf_dir))
    check(
        "simhash no window",
        "windowspecdefinition" not in p,
        "canonical id from groupBy bucket-min + equi-join; no window in the plan",
    )

    # 13. MinHash LSH: band-bucket candidate generation is equi-joins
    # with a partial-aggregated bucket-size cap — no cartesian product
    p = plan_of(m.all_queries()["dedup_minhash_lsh"](spark, sf_dir))
    check(
        "minhash no cartesian",
        "CartesianProduct" not in p and p.count("HashAggregate") >= 2,
        "banded equi-joins + partial-agg bucket cap; no cross join",
    )

    # 14. ngram_jaccard: the per-doc sizes relation must not carry a
    # mandatory broadcast hint (a corpus-wide call would ship one row
    # per doc to every executor); AQE picks the strategy
    ng = m.all_queries()["ngram_jaccard"](spark, sf_dir)
    check(
        "ngram no forced broadcast",
        "ResolvedHint" not in ng._jdf.queryExecution().analyzed().toString(),
        "per-doc sizes joins have no broadcast hint; AQE decides",
    )

    # 15. parameterized ANN helpers run ZERO driver jobs at plan time
    # (dim/planes/n_rows provided -> no count()/first() probes)
    from bubbles.operators.similarity import lsh_topk

    store = spark.sparkContext._jsc.sc().statusStore()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = store.jobsList(None).size()
    lsh_topk(emb, k=3, dim=64, planes=8)
    n_jobs = store.jobsList(None).size() - n0
    check(
        "lsh zero plan-time jobs",
        n_jobs == 0,
        f"lsh_topk(dim=, planes=) triggered {n_jobs} driver jobs before "
        "the first real stage",
    )

    # 16. sequence packing: ONE exchange (the stream key); the
    # running-sum window must not add a second shuffle or a global sort
    p = plan_of(m.all_queries()["pack_sequences"](spark, sf_dir))
    check(
        "packing single bounded exchange",
        p.count("Exchange hashpartitioning") == 1 and "Exchange rangepartitioning" not in p,
        "per-stream running sum over one stream-key exchange; no global sort",
    )

    # 17. decontamination: gram overlap is an equi-join (never
    # cartesian) and the benchmark side carries no broadcast hint
    dq = m.all_queries()["decontaminate"](spark, sf_dir)
    check(
        "decontaminate equi-join only",
        "CartesianProduct" not in plan_of(dq)
        and "ResolvedHint" not in dq._jdf.queryExecution().analyzed().toString(),
        "distinct-gram equi-join; AQE owns the strategy",
    )

    # 18. corpus vocab: global top-k plans as TakeOrderedAndProject
    # (driver-bounded k), not a full sort of the vocabulary
    p = plan_of(m.all_queries()["corpus_vocab"](spark, sf_dir))
    check(
        "vocab top-k no full sort",
        "TakeOrderedAndProject" in p,
        "explode -> partial agg -> TakeOrderedAndProject(50)",
    )

    # 19. keyword search: corpus stats reach the scoring scan as a
    # broadcast of ONE row (never a shuffled join), and the global
    # top-k is driver-bounded
    p = plan_of(m.all_queries()["keyword_search"](spark, sf_dir))
    check(
        "keyword search broadcast stats + bounded top-k",
        "BroadcastNestedLoopJoin" in p
        and "SortMergeJoin" not in p
        and "TakeOrderedAndProject" in p,
        "1-row stats broadcast over the scoring scan; TakeOrderedAndProject(20)",
    )

    # 20. winnowing: the gram-hash array is built once per row before
    # the generate (no md5 inside the window), one hash exchange for
    # the per-doc window
    wq = m.all_queries()["doc_fingerprint"](spark, sf_dir)
    p = plan_of(wq)
    # plan prints root-first: everything BEFORE "Generate" in the
    # string sits above the posexplode (window/filter/distinct) and
    # must not recompute the hash; the md5 lives once below it
    has_gen = "Generate posexplode" in p
    above = p[: p.index("Generate")] if has_gen else p
    below = p[p.index("Generate") :] if has_gen else ""
    check(
        "winnowing hashes once below generate",
        has_gen and "md5" not in above and "md5" in below,
        "md5 per gram happens once below posexplode; window sees longs only",
    )

    # 20b. winnowing + LSH ANN plan CONSTRUCTION runs zero driver jobs
    # and never converts the DataFrame to an RDD (df.rdd just to read
    # the split count forces a full plan conversion per call)
    from bubbles.operators.text import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = store.jobsList(None).size()
    winnow_fingerprints(docs)
    n_jobs = store.jobsList(None).size() - n0
    check(
        "winnowing zero plan-time jobs",
        n_jobs == 0,
        f"winnow_fingerprints plan construction triggered {n_jobs} driver jobs",
    )
    # df.rdd never appears in the batch operator modules: reading the
    # split count through it forces a DataFrame->RDD plan conversion
    # (jobs-invisible, so checked at the source level)
    import pathlib

    rdd_hits = [
        f.name
        for f in pathlib.Path("bubbles/operators").glob("*.py")
        if any(
            ".rdd" in line.split("#", 1)[0]
            for line in f.read_text().splitlines()
        )
    ]
    check(
        "no df.rdd in batch operators",
        not rdd_hits,
        f"DataFrame->RDD conversions in operator modules: {rdd_hits or 'none'}",
    )

    # 21. incremental dedup (MinHash scale path): band-bucket and
    # side joins stay equi-joins (no cartesian), no mandatory
    # broadcast of an unbounded relation
    iq = m.all_queries()["incremental_dedup"](spark, sf_dir)
    check(
        "incremental dedup equi-join, AQE-owned",
        "CartesianProduct" not in plan_of(iq)
        and "ResolvedHint" not in iq._jdf.queryExecution().analyzed().toString(),
        "LSH band equi-join + side equi-joins; strategies AQE-owned",
    )

    # 22. Bloom incremental dedup: the bitmap words relation reaches
    # the batch probe as a BROADCAST (it is n_bits/64 rows by
    # construction), and the plan has no cartesian product — the
    # historical corpus is only ever scanned/aggregated, never joined
    # row-for-row against the batch
    bq = m.all_queries()["bloom_incremental_dedup"](spark, sf_dir)
    bp = plan_of(bq)
    check(
        "bloom dedup broadcast bitmap, no cartesian",
        "BroadcastHashJoin" in bp and "CartesianProduct" not in bp,
        "fixed-size (word, bits) relation broadcast to the probe; "
        "survivor-only anti-join for the exact verify",
    )

    # 23. bigram LM scoring: the context-count aggregation reuses the
    # bigram-count shuffle (ReusedExchange — corpus bigrams explode +
    # partial-agg run ONCE), the single-row vocab relation arrives by
    # broadcast (no driver collect, no plan-time job), no cartesian
    lq = m.all_queries()["lm_score"](spark, sf_dir)
    # execute THIS df (not a derived count) so AQE finalizes the
    # runtime exchange reuse on the audited plan
    lq.collect()
    lp = plan_of(lq)
    check(
        "lm_score reused bigram shuffle + broadcast vocab",
        "ReusedExchange" in lp
        and "IdentityBroadcastMode" in lp
        and "CartesianProduct" not in lp,
        "ctx agg reuses the bigram-count exchange; vocab rides a "
        "1-row broadcast nested-loop join",
    )

    # 24. semantic dedup: corpus scanned once for assignment (no
    # shuffle before the mapInPandas kernel), ONE hash exchange on
    # centroid id for the bucket kernel, no cartesian product
    sq = m.all_queries()["semantic_dedup"](spark, sf_dir)
    sp_ = plan_of(sq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", sp_))
    check(
        "semantic dedup single centroid shuffle",
        "CartesianProduct" not in sp_ and n_exch == 1 and "centroid" in sp_,
        f"assignment is shuffle-free; {n_exch} hash exchange(s) "
        "(centroid bucket kernel only)",
    )

    # 25. k-means: the returned assignment plan is scan -> broadcast
    # -centroid mapInPandas with ZERO exchanges — the corpus is never
    # shuffled; only the k x dim partial-sum agg (inside the update
    # jobs, not this plan) ever exchanges anything
    kq = m.all_queries()["kmeans_fit"](spark, sf_dir)
    kp = plan_of(kq)
    check(
        "kmeans assignment shuffle-free",
        "MapInPandas" in kp
        and "Exchange hashpartitioning" not in kp
        and "CartesianProduct" not in kp,
        "final assignment pass: columnar scan + Arrow kernel, no exchange",
    )

    # 26. funnel: the whole sequential walk costs ONE user_id hash
    # exchange (collect_list agg) — no window, no k-self-join chain
    # (the textbook funnel shuffles once per step), no cartesian
    fq = m.all_queries()["funnel_counts"](spark, sf_dir)
    fp = plan_of(fq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", fp))
    check(
        "funnel single user shuffle, no window",
        n_exch == 1 and "Window" not in fp and "CartesianProduct" not in fp,
        f"{n_exch} hash exchange(s); greedy walk is an in-row "
        "F.aggregate fold, steps never self-join",
    )

    # 27. cohort retention: exactly two hash exchanges (per-user agg,
    # then the tiny cohort x offset count), both with map-side partials
    cq = m.all_queries()["cohort_retention"](spark, sf_dir)
    cp = plan_of(cq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", cp))
    check(
        "cohort retention two exchanges, partial aggs",
        n_exch == 2
        and cp.count("ObjectHashAggregate") + cp.count("HashAggregate") >= 4
        and "CartesianProduct" not in cp,
        f"{n_exch} hash exchange(s); collect_set and the final count "
        "both run partial+final",
    )

    # 28. pagerank (2 unrolled iterations): equi-joins only — never a
    # cartesian — and every inflow sum aggregates with map-side
    # partials (high-in-degree skew is absorbed before the shuffle)
    pq = m.all_queries()["pagerank"](spark, sf_dir)
    pp = plan_of(pq)
    check(
        "pagerank equi-joins + partial inflow sums",
        "CartesianProduct" not in pp
        and "BroadcastNestedLoopJoin" not in pp
        and pp.count("HashAggregate") >= 4,
        "rank-edge joins keyed on src/dst; partial_sum before each "
        "inflow exchange",
    )

    # 29. triangle count: wedge generation and the closing check are
    # equi-joins (never a cartesian / nested-loop), and the close is
    # a semi-join — wedges are probed, never multiplied
    tq = m.all_queries()["triangle_count"](spark, sf_dir)
    tp = plan_of(tq)
    check(
        "triangle count equi-joins + semi close",
        "CartesianProduct" not in tp
        and "BroadcastNestedLoopJoin" not in tp
        and "LeftSemi" in tp,
        "degree-oriented wedge self-join keyed on the low endpoint; "
        "closing edge check is a left-semi equi-join",
    )

    # 30. active users: the rolling distinct is the bounded fan-out +
    # two-phase distinct agg — NO nested-loop range join, no window
    aq = m.all_queries()["active_users"](spark, sf_dir)
    ap = plan_of(aq)
    check(
        "active users no range join",
        "BroadcastNestedLoopJoin" not in ap
        and "CartesianProduct" not in ap
        and "Window" not in ap,
        "7x explode fan-out + partial distinct agg; day-keyed "
        "equi-joins only",
    )

    # 31. segment dedup: md5-keyed equi-joins and partial-agg
    # shuffles only — no window, no nested loop; bounded exchange
    # count (token agg, freq agg, flag join, doc rebuild)
    sdq = m.all_queries()["segment_dedup"](spark, sf_dir)
    sdp = plan_of(sdq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", sdp))
    check(
        "segment dedup equi shuffles only",
        "Window" not in sdp
        and "CartesianProduct" not in sdp
        and "BroadcastNestedLoopJoin" not in sdp
        and n_exch <= 5,
        f"{n_exch} hash exchange(s); boilerplate freq is a two-phase "
        "distinct agg on md5 keys; rebuild is one doc-keyed agg",
    )

    # 32. profile: ONE aggregation node for all columns — a single
    # Expand (the exact-distinct fan-out), partial+final hash agg,
    # never one job per column
    prq = m.all_queries()["profile_table"](spark, sf_dir)
    prp = plan_of(prq)
    n_agg = prp.count("HashAggregate") + prp.count("SortAggregate")
    check(
        "profile single Expand aggregation",
        prp.count("Expand") == 1 and n_agg >= 2,
        "all 5 columns profile through one Expand + two-phase agg "
        "(partial_first/partial_count below one exchange)",
    )

    # 33. KMV sketch: the distinct + salted bottom-k shape — hash
    # exchanges only, no unbounded per-group sort outside the
    # salt-capped windows
    kvq = m.all_queries()["kmv_distinct"](spark, sf_dir)
    kvp = plan_of(kvq)
    check(
        "kmv distinct + salted bottom-k",
        "CartesianProduct" not in kvp
        and "BroadcastNestedLoopJoin" not in kvp
        and kvp.count("+- Window ") == 1
        and kvp.count("WindowGroupLimit") >= 1
        and "ObjectHashAggregate" in kvp,
        "ONE salt-capped window pass (pre-rank <=k per salt, under a "
        "WindowGroupLimit rank pushdown); the exact bottom-k stats "
        "come from the final per-group aggregation over the <=32k "
        "salt-capped survivors (round-11: second window+exchange "
        "folded into the agg); equi-shuffles only",
    )

    # 34. chunking: pure scan -> project -> generate — zero exchanges
    chq = m.all_queries()["chunk_documents"](spark, sf_dir)
    chp = plan_of(chq)
    check(
        "chunking zero shuffles",
        "Exchange" not in chp and "Generate" in chp,
        "projection + posexplode at scan speed; no exchange in the plan",
    )

    # 35. CDC merge: winner-per-key is a two-phase max(struct) agg (no
    # window), apply is equi-join + union
    muq = m.all_queries()["merge_upsert"](spark, sf_dir)
    mup = plan_of(muq)
    check(
        "cdc merge no window, partial max-struct",
        "Window" not in mup
        and "CartesianProduct" not in mup
        and mup.count("HashAggregate") >= 2,
        "winner-per-key via partial+final max(struct); anti-join + union apply",
    )

    # 36. salted join: the dim replication is a bounded Generate and
    # the join stays an equi hash/merge join on (key, salt)
    sjq = m.all_queries()["salted_join"](spark, sf_dir)
    sjp = plan_of(sjq)
    check(
        "salted join equi on (key, salt)",
        "Generate explode" in sjp
        and "CartesianProduct" not in sjp
        and "BroadcastNestedLoopJoin" not in sjp,
        "8x dim replication via explode(sequence); equi-join only",
    )

    # 37. RAG pipeline: gate -> dedup -> chunk -> rollup composes in
    # one plan — the chunk explode (Generate) present, no cartesian,
    # no window, bounded exchange count
    rgq = m.all_queries()["pipeline_rag_index"](spark, sf_dir)
    rgp = plan_of(rgq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", rgp))
    check(
        "rag pipeline composed plan",
        "Generate" in rgp
        and "CartesianProduct" not in rgp
        and "Window" not in rgp
        and n_exch <= 6,
        f"{n_exch} hash exchange(s); zero-shuffle chunk explode rides "
        "between the content-hash dedup and the rollup",
    )

    # 38. URL canonicalization: pure projection — no exchange at all
    ucq = m.all_queries()["url_canonical"](spark, sf_dir)
    ucp = plan_of(ucq)
    check(
        "url canonicalization zero shuffles",
        "Exchange" not in ucp,
        "regex grammar + param sort as column expressions at scan speed",
    )

    # 39. privacy release: suppression is one count agg + one
    # equi-join; tokenization is a projection — no window, no cartesian
    pvq = m.all_queries()["privacy_release"](spark, sf_dir)
    pvp = plan_of(pvq)
    check(
        "privacy suppression agg + equi-join",
        "Window" not in pvp
        and "CartesianProduct" not in pvp
        and "BroadcastNestedLoopJoin" not in pvp
        and pvp.count("HashAggregate") >= 2,
        "two-phase value counts; keyed md5 tokens ride the projection",
    )

    # 40. histogram: the exchange carries bins, not rows — two-phase
    # hash agg, nothing else
    vhq = m.all_queries()["value_histogram"](spark, sf_dir)
    vhp = plan_of(vhq)
    check(
        "histogram partial agg only",
        vhp.count("HashAggregate") >= 2 and "Window" not in vhp,
        "map-side partials reduce each partition to <= #bins rows "
        "before the shuffle",
    )

    # 41. inverted index: tf + df partial aggs; the posting cap rides
    # the salted two-phase top-k (WindowGroupLimit pushdown), df join
    # is an equi-join
    iiq = m.all_queries()["inverted_index"](spark, sf_dir)
    iip = plan_of(iiq)
    check(
        "inverted index salted posting cap",
        iip.count("HashAggregate") >= 4
        and iip.count("WindowGroupLimit") >= 2
        and "CartesianProduct" not in iip,
        "two partial-agged shuffles (tf, df) + salt-capped rank; "
        "stopword terms never sort in one partition",
    )

    # 42. substring dedup: gram md5 computed once BELOW the generate,
    # equi-shuffles only (dup-count agg, semi join, coverage distinct,
    # anti join, rebuild agg), no window, no non-equi join
    ssq = m.all_queries()["substring_dedup"](spark, sf_dir)
    ssp = plan_of(ssq)
    n_exch = len(re.findall(r"Exchange hashpartitioning", ssp))
    check(
        "substring dedup equi shuffles only",
        "Window" not in ssp
        and "CartesianProduct" not in ssp
        and "BroadcastNestedLoopJoin" not in ssp
        and ssp.count("Generate") >= 2
        and n_exch <= 6,
        f"{n_exch} hash exchange(s); sliding-gram md5s hash once below "
        "the posexplode; coverage fan-out is the bounded L-per-start "
        "explode; removal is one (doc,pos) anti-join",
    )

    # 43. quantization: pure projection — zero exchanges
    qzq = m.all_queries()["quantize_embeddings"](spark, sf_dir)
    qzp = plan_of(qzq)
    check(
        "quantization zero shuffles",
        "Exchange" not in qzp,
        "per-vector scale + int8 codes as column expressions at scan speed",
    )

    # 44. resample: bucket dedup + span agg are partial-agged; exactly
    # one window pass, over the reduced grid
    rsq = m.all_queries()["resample_ffill"](spark, sf_dir)
    rsp = plan_of(rsq)
    check(
        "resample one window over reduced grid",
        rsp.count("+- Window ") == 1
        and (rsp.count("HashAggregate") + rsp.count("SortAggregate")) >= 4
        and "partial_max(struct" in rsp
        and "CartesianProduct" not in rsp,
        "two-phase max(struct) bucket dedup (partial+final SortAggregate "
        "— struct aggs don't hash) + per-key span explode; the single "
        "window sees one row per bucket, never raw events",
    )

    # 45. collocations: bigram + unigram partial aggs, bounded top-k,
    # no full sort, no cartesian beyond the 1-row total broadcast
    clq = m.all_queries()["collocations"](spark, sf_dir)
    clp = plan_of(clq)
    check(
        "collocations partial aggs + bounded top-k",
        "TakeOrderedAndProject" in clp
        and clp.count("HashAggregate") >= 4
        and "CartesianProduct" not in clp,
        "two partial-agged count shuffles; vocab-sized equi-joins; "
        "1-row N broadcast; top-k never sorts the pair relation",
    )

    # 46. corpus diff: ONE full-outer equi-join of (key, md5) slims —
    # the text column must never appear above the hash projections
    cdq = m.all_queries()["corpus_diff"](spark, sf_dir)
    cdp = plan_of(cdq)
    check(
        "corpus diff slim digest join",
        cdp.count("FullOuter") >= 1
        and "CartesianProduct" not in cdp
        and "Window" not in cdp,
        "versions reduce to (key, payload-md5) before one full-outer "
        "equi-join; 16-byte digests cross the wire, never content",
    )

    # round-6 additions: layout + sketch-overlap + anomaly + bucketed
    zp = plan_of(m.all_queries()["zorder_key"](spark, sf_dir))
    check(
        "zorder single scan + broadcast bounds",
        "BroadcastNestedLoopJoin" in zp or "BroadcastExchange" in zp,
        "one tiny min/max agg broadcast back; interleave is a flat "
        "codegen projection, no second data pass",
    )
    check(
        "zorder no wide shuffle",
        "Exchange hashpartitioning" not in zp.split("== Initial Plan ==")[0],
        "the data-sized side never hash-shuffles",
    )
    cp = plan_of(m.all_queries()["compaction_plan"](spark, sf_dir))
    check(
        "compaction one window exchange",
        cp.count("Window") >= 1 and "CartesianProduct" not in cp,
        "next-fit bins = one running-sum window per table partition "
        "over metadata-scale rows",
    )
    kop = plan_of(m.all_queries()["kmv_overlap"](spark, sf_dir))
    check(
        "kmv_overlap equi-joins only",
        "CartesianProduct" not in kop and "NestedLoop" not in kop,
        "two corpora meet only through <=k-row-per-group sketches",
    )
    from bubbles.streaming.events import anomaly_flags_batch, read_events_batch

    anp = plan_of(anomaly_flags_batch(read_events_batch(spark, sf_dir)))
    check(
        "anomaly twin single user exchange",
        anp.count("Exchange hashpartitioning") <= 1 and anp.count("Window") >= 1,
        "one shuffle on user_id feeds the exclusive running-sums window",
    )
    from bubbles.sources.bucketed import bucketed_join, write_bucketed

    fact = spark.range(20_000).selectExpr("id AS k", "id * 3 AS v")
    dim = spark.range(0, 20_000, 7).selectExpr("id AS k", "concat('d', id) AS nm")
    write_bucketed(fact, "pa_fact_b", "k", 8)
    write_bucketed(dim, "pa_dim_b", "k", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bj = bucketed_join(spark, "pa_fact_b", "pa_dim_b", "k")
    bj.collect()
    bp = plan_of(bj)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS pa_fact_b")
    spark.sql("DROP TABLE IF EXISTS pa_dim_b")
    check(
        "bucketed join zero exchange",
        "SortMergeJoin" in bp and "Exchange" not in bp
        and "Bucketed: true" in bp,
        "pay the shuffle once at write; every later key join is "
        "co-located (sources/bucketed.py)",
    )

    scd = plan_of(m.all_queries()["scd2_dimension_join"](spark, sf_dir))
    check(
        "scd2 temporal join equi + interval filter",
        "CartesianProduct" not in scd and "NestedLoop" not in scd,
        "facts meet at most versions-per-key candidates through an "
        "equi-join; the interval predicate is a residual filter",
    )
    kb = plan_of(m.all_queries()["dedup_keep_best"](spark, sf_dir))
    check(
        "keep-best winner is a two-phase agg, not a window",
        "Window" not in kb.split("== Initial Plan ==")[0],
        "max(struct(quality,id)) partials absorb a viral dup cluster "
        "map-side; no per-group sort partition",
    )
    gs = plan_of(m.all_queries()["grouping_sets_revenue"](spark, sf_dir))
    check(
        "grouping sets single Expand",
        gs.split("== Initial Plan ==")[0].count("Expand") == 1,
        "((rf,ls),(rf),()) in one Expand + two-phase hash agg",
    )
    cb = plan_of(m.all_queries()["curriculum_buckets"](spark, sf_dir))
    cb0 = cb.split("== Initial Plan ==")[0]
    check(
        "curriculum corpus side never sorts or shuffles for the join",
        ("BroadcastNestedLoopJoin" in cb or "BroadcastExchange" in cb)
        and "SortMergeJoin" not in cb0
        and "ntile" not in cb0,
        "thresholds reduce to ONE broadcast row and bucket assignment is "
        "a projection over the scan; the windows in the plan sit only in "
        "the <=k-row threshold branch (the ntile() alternative would be "
        "a single-partition global sort of the corpus)",
    )

    # round 8: out-of-sample predict — the NEW-POINT side must be one
    # mapInPandas over the scan with no exchange/join/window (that plan
    # shape is what makes the same operator run unchanged on a stream)
    from bubbles import MRHDBSCAN

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("point_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    train = emb.filter(F.col("point_id") < 400)
    pm = MRHDBSCAN(
        min_pts=4, min_cluster_size=10, max_local_size=2000, dim=64
    ).fit(train)
    pp = plan_of(
        pm.predict(train, emb.filter(F.col("point_id") >= 400), min_pts=4)
    )
    check(
        "predict is shuffle-free on the new-point side",
        "Exchange" not in pp
        and "Join" not in pp
        and "Window" not in pp
        and "MapInPandas" in pp,
        "one broadcast-backed MapInPandas over the scan — zero "
        "exchanges, so the identical plan legally runs on a streaming "
        "source (stream scoring)",
    )

    # round 9: DISTRIBUTED predict (past the broadcast cap) — the
    # fitted reference must reach the candidate join through the IVF
    # index path, never as a driver collect + broadcast of the
    # reference rows (only bounded state — centroids — is collected)
    ppi = plan_of(
        pm.predict(
            train,
            emb.filter(F.col("point_id") >= 400),
            min_pts=4,
            index="ivf",
            index_kwargs={"n_centroids": 16, "n_probe": 4},
        )
    )
    ppi0 = ppi.split("== Initial Plan ==")[0]
    check(
        "distributed predict never broadcasts the reference",
        "FlatMapCoGroupsInPandas" in ppi
        and "BroadcastNestedLoopJoin" not in ppi0
        and "CartesianProduct" not in ppi0,
        "candidates come from the IVF cogroup scoring kernel; the "
        "reference side moves only through equi-joins (exact re-rank "
        "verifies candidates in the true metric, JVM-side)",
    )

    # round 10: PERSISTED predict index — a loaded model's warm
    # predict must take its candidates from the saved inverted lists
    # (parquet scan of predict_index/members), never re-running the
    # reference-side assignment pass or re-capping the lists
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        from bubbles.plans.mrhdbscan import MRHDBSCANModel
        import warnings as _w

        pm.save(
            f"{td}/m", fitted_points=train, predict_rows_per_cluster=0,
            index="ivf",
        )
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            loadedm = MRHDBSCANModel.load(spark, f"{td}/m")
        wdf = loadedm.predict(
            emb.filter(F.col("point_id") >= 400), min_pts=4, index="ivf"
        )
        wp = plan_of(wdf)
        wfiles = wdf.inputFiles()
        check(
            "persisted-index predict reads the saved inverted lists",
            any("predict_index/members" in f for f in wfiles)
            and "FlatMapCoGroupsInPandas" in wp
            and not any("predict_index/centroids" in f for f in wfiles),
            "warm batches pay query-side probe + cogroup + re-rank only: "
            "members come from the persisted parquet, centroids were "
            "loaded once as bounded driver state (not re-joined), and no "
            "corpus-side assignment kernel appears in the plan",
        )

    # round 11: PERSISTED LSH predict index — the streaming-build /
    # churny-corpus variant. The warm predict must take its corpus side
    # from the saved capped sign-bit buckets (partition-pruned per
    # table), re-deriving only the hyperplanes (bounded meta, no
    # payload) for the query side — never re-bucketing the reference
    with tempfile.TemporaryDirectory() as td:
        pm.save(
            f"{td}/m", fitted_points=train, predict_rows_per_cluster=0,
            index="lsh",
        )
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            loadedl = MRHDBSCANModel.load(spark, f"{td}/m")
        ldf = loadedl.predict(
            emb.filter(F.col("point_id") >= 400), min_pts=4, index="lsh"
        )
        lp = plan_of(ldf)
        lfiles = ldf.inputFiles()
        lp0 = lp.split("== Initial Plan ==")[0]
        check(
            "persisted-LSH predict reads the saved capped buckets",
            any("predict_index/buckets" in f for f in lfiles)
            and "FlatMapCoGroupsInPandas" in lp
            and "PartitionFilters: [isnotnull(table" in lp
            and "BroadcastNestedLoopJoin" not in lp0
            and "CartesianProduct" not in lp0,
            "warm LSH batches bucket only the query side (hyperplanes "
            "re-derive from the one meta row); the corpus side is the "
            "persisted table-partitioned parquet, partition-pruned per "
            "table, meeting queries in the capped cogroup kernel — the "
            "exact re-rank joins the full reference by id only",
        )

    lines = [
        "# PLANS — physical-plan audit (tools/plan_audit.py)",
        "",
        f"Run at `{sf_dir}`, Spark {spark.version}, AQE on. These properties",
        "are what the 100 TB story rests on; re-run after operator changes.",
        "",
        "| check | ok | detail |",
        "|---|---|---|",
    ]
    for name, ok, detail in checks:
        lines.append(f"| {name} | {'✅' if ok else '❌'} | {detail} |")
    fails = [c for c in checks if not c[1]]
    lines.append("")
    lines.append(
        f"{len(checks) - len(fails)}/{len(checks)} checks pass."
        + (f" FAILING: {[c[0] for c in fails]}" if fails else "")
    )
    open("PLANS.md", "w").write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
