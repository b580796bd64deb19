"""KMV (k-minimum-values) distinct-count sketch — the mergeable,
ENGINE-PORTABLE approximate-cardinality primitive (Bar-Yossef et al.
2002; the bottom-k refinement of Flajolet-Martin that HyperLogLog
later compressed).

Why not Spark's built-in ``approx_count_distinct``: its HLL++ binary
sketch is a Spark-internal format — no other engine reproduces it, so
it can't be twin-checked, persisted for a non-Spark consumer, or
merged with sketches built elsewhere. KMV is just "the k smallest
md5 values of the distinct inputs": any engine with md5 computes the
identical sketch, sketches merge by taking the bottom-k of a union,
and the estimator is a closed-form integer expression. That also
makes it bit-deterministic across runs, partitionings and engines —
the property every oracle twin in this repo is built on.

Hash: first 15 hex chars of md5 → a 60-bit integer in [0, 2^60)
(``conv(substr(md5(v), 1, 15), 16, 10)`` / DuckDB
``CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)`` — the repo-standard
md5-prefix integer, splits.py:20). 60 bits keeps the estimator's
``(k-1) * 2^60`` numerator inside DECIMAL(38) while leaving birthday
collisions negligible until ~2^30 distinct values per group.

Estimator: with n_kept = k minimum values and kth = the k-th smallest
hash, the distinct count is ``(k-1) * 2^60 div kth`` (the classic
unbiased KMV estimate, floor-divided so both engines agree exactly);
when a group holds fewer than k distinct values the sketch IS the
distinct set and the count is exact. Relative error ~ 1/sqrt(k-2)
(~6% at k=256).

Scale shape: one ``distinct`` on (group, hash) — two-phase, map-side
partials absorb duplicate values before the shuffle — then the
bottom-k per group runs through the skew-safe salted two-phase top-k
(similarity.salted_topk_per_key): a group with 10^9 distinct hashes
never sorts in one window partition; each salt keeps k, the final
rank sees ≤ 32·k survivors per group. No windows over unbounded
groups, no collect, equi-shuffles only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS  # 16^15

# salt fan-out of the skew-safe bottom-k pre-rank (matches
# similarity.salted_topk_per_key's default)
_N_SALTS = 32


def _capped_hash_rows(hashed: DataFrame, group_col: str, k: int) -> DataFrame:
    """Salt-capped distinct-hash rows: per (group, salt-of-hash) keep
    the k smallest — a SUPERSET of the group's true bottom-k, hard-
    bounded at ``_N_SALTS * k`` rows per group regardless of skew
    (the first phase of salted_topk_per_key). The second, per-group
    rank is deliberately NOT run here: every KMV consumer below ends
    in a per-group aggregation anyway, which recovers the exact
    bottom-k stats from the sorted bounded array — one exchange+sort
    per sketch cheaper than the full two-phase top-k (guide §2.4).
    The single window is WindowGroupLimit-eligible (one row_number,
    immediate <= k filter), so no (group, salt) partition is ever
    fully sorted."""
    salt = F.pmod(F.xxhash64("__hv"), F.lit(_N_SALTS))
    w1 = Window.partitionBy(group_col, "__salt").orderBy("__hv")
    return (
        hashed.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )


def kmv_hash(col) -> "F.Column":
    """60-bit md5-prefix hash of a column's string form (NULL-safe:
    NULL hashes to NULL and is excluded from sketches)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch + cardinality estimate:
    ``(group_col, n_kept, kth_min, est_distinct)``.

    ``n_kept`` is the sketch size (min(k, true distinct count)),
    ``kth_min`` the largest retained hash, ``est_distinct`` the exact
    count when n_kept < k, else the KMV estimate — all integers, so
    the DuckDB twin is bit-identical."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    hashed = (
        df.select(F.col(group_col), kmv_hash(F.col(value_col)).alias("__hv"))
        .filter(F.col("__hv").isNotNull())
        .distinct()
    )
    return _bottomk_stats(_capped_hash_rows(hashed, group_col, k), group_col, k)


def _bottomk_stats(capped: DataFrame, group_col: str, k: int) -> DataFrame:
    """(group, n_kept, kth_min, est_distinct) from salt-capped rows:
    the per-group sorted array (bounded at _N_SALTS*k elements) yields
    the exact bottom-k count and k-th minimum — the capped rows always
    contain the true bottom-k (an element of global rank j <= k has
    per-salt rank <= j), and when a group holds < k distinct hashes
    the cap retains all of them."""
    sk = capped.groupBy(group_col).agg(
        F.array_sort(F.collect_list("__hv")).alias("__arr")
    )
    n_kept = F.least(F.lit(k), F.size("__arr")).cast("long")
    sk = sk.select(
        group_col,
        n_kept.alias("n_kept"),
        F.element_at(F.col("__arr"), F.least(F.lit(k), F.size("__arr"))).alias(
            "kth_min"
        ),
    )
    # (k-1) * 2^60 needs ~68 bits -> DECIMAL(38,0); `div` floors, and
    # both inputs are positive, so DuckDB's HUGEINT // matches exactly
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"CAST({k - 1} AS DECIMAL(38,0)) * {HASH_SPACE} div kth_min")
    )
    return sk.select(
        group_col,
        "n_kept",
        "kth_min",
        est.cast("long").alias("est_distinct"),
    )


def kmv_merge(sketches: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Merge per-partition KMV sketches (rows of (group, __hv), e.g.
    from sketching corpus shards independently) back into one
    per-group sketch — bottom-k of the union of bottom-k sets, the
    property that makes KMV usable across 100 TB worth of
    independently-profiled parquet drops. Input rows must carry the
    retained hashes in ``__hv``; output matches ``kmv_distinct`` run
    over the union of the original inputs exactly (pinned by
    tests/test_profile_sketch.py)."""
    if k < 2:
        # k=1 makes (k-1)*HASH_SPACE // kth = 0 — every group would
        # silently report 0 distinct (same guard as kmv_distinct)
        raise ValueError(f"k must be >= 2, got {k}")

    uniq = sketches.select(F.col(group_col), F.col("__hv")).distinct()
    return _bottomk_stats(_capped_hash_rows(uniq, group_col, k), group_col, k)


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV set operations (Beyer et al., SIGMOD 2007): per-group
    union / intersection / Jaccard estimates between two relations —
    the "how much does release B overlap release A" question answered
    from two bottom-k sketches instead of a corpus-sized join.

    Method: sketch each side (bottom-k distinct 60-bit md5 hashes per
    group), form the UNION sketch (bottom-k of the merged hash sets),
    and count how many union-sketch members appear in BOTH side
    sketches (``k_intersect``). Then, with ``n_kept`` the union-sketch
    size and ``est_union`` the standard KMV estimate over it:

    - ``jaccard_ppm   = 1_000_000 * k_intersect div n_kept``
    - ``est_intersect = est_union * k_intersect div n_kept``

    All integer arithmetic (ppm instead of a float ratio), so the
    DuckDB twin is bit-identical; when a group's union holds < k
    distinct values every number is exact, not an estimate. Relative
    error of the estimated path ~ 1/sqrt(k-2) per group.

    Scale shape (rebuilt round 11, guide §2.4): each side costs one
    partial-agged distinct plus the salted bottom-k — and appears in
    the plan exactly ONCE. The original formulation reused each side's
    lazy sketch frame three times (union, membership marker join,
    side estimator), and Catalyst does not CSE shared subtrees across
    joins, so the whole scan→hash→distinct→bottom-k pipeline executed
    SIX times (measured: 6 parquet scans, 44 Exchange nodes,
    plans/r11/kmv_overlap_before.txt). Now the two sketches are tagged
    and merged once into per-hash membership flags (one partial-agged
    shuffle), and every output number — union bottom-k stats, side
    counts/kth-mins — comes out of ONE per-group aggregation whose
    collect_list is bounded at 2·_N_SALTS·k rows per group (each side
    is salt-capped), so no per-group window, no joins, no unbounded
    state. Two 50 TB
    corpus releases never meet in a shuffle — only their sketches do.
    Output: (group, n_kept_union, est_a, est_b, est_union,
    k_intersect, jaccard_ppm, est_intersect)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def _hashed(df):
        return (
            df.select(
                F.col(group_col), kmv_hash(F.col(value_col)).alias("__hv")
            )
            .filter(F.col("__hv").isNotNull())
            .distinct()
        )

    # salt-capped rows per side (NOT the exact bottom-k): the cap is a
    # superset of each side's true bottom-k, and the final aggregation
    # recovers every exact statistic from the sorted bounded array —
    # correctness notes inline below.
    sa = _capped_hash_rows(_hashed(df_a), group_col, k)
    sb = _capped_hash_rows(_hashed(df_b), group_col, k)

    # NULL-group rows keep the original join-based semantics (a NULL
    # group never matched the marker/estimator equi-joins, so its
    # k_intersect/est_a/est_b were 0 while the union stats were real):
    # zero the membership flags for NULL groups.
    gnn = F.col(group_col).isNotNull()
    tagged = sa.select(
        F.col(group_col),
        "__hv",
        F.when(gnn, 1).otherwise(0).alias("__ina"),
        F.lit(0).alias("__inb"),
    ).unionByName(
        sb.select(
            F.col(group_col),
            "__hv",
            F.lit(0).alias("__ina"),
            F.when(gnn, 1).otherwise(0).alias("__inb"),
        )
    )
    flags = tagged.groupBy(group_col, "__hv").agg(
        F.max("__ina").alias("__ina"), F.max("__inb").alias("__inb")
    )
    # ONE bounded aggregation per group over <= 2*_N_SALTS*k rows.
    # Exactness of each statistic from capped (not exact-bottom-k)
    # rows:
    # - union bottom-k: an element of global union rank j <= k has
    #   side rank <= j in whichever side holds it, hence per-salt side
    #   rank <= j <= k — always retained; so the first
    #   min(k, |union|) elements of the sorted array ARE the union
    #   sketch, and when |union| < k every element is retained.
    # - k_intersect: for an element of the union bottom-k, membership
    #   in a side's capped set == membership in that side's exact
    #   bottom-k sketch (its side rank is <= its union rank <= k), so
    #   the flag sum over the sliced prefix matches the original
    #   marker-join count.
    # - side stats: the true bottom-k of each side survives the cap,
    #   so n_a = min(k, #a-flagged) and the n_a-th a-flagged element
    #   is the side's exact k-th minimum.
    g = flags.groupBy(group_col).agg(
        F.array_sort(F.collect_list(F.struct("__hv", "__ina", "__inb"))).alias(
            "__all"
        )
    )
    a_rows = F.expr("filter(__all, x -> x.__ina = 1)")
    b_rows = F.expr("filter(__all, x -> x.__inb = 1)")
    nku = F.least(F.lit(k), F.size("__all"))
    g = g.select(
        group_col,
        nku.cast("long").alias("n_kept_union"),
        F.element_at(F.col("__all"), nku)["__hv"].alias("__kth"),
        F.aggregate(
            F.slice(F.col("__all"), 1, k),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (x["__ina"] * x["__inb"]).cast("long"),
        ).alias("k_intersect"),
        F.least(F.lit(k), F.size(a_rows)).cast("long").alias("__na"),
        F.when(
            F.size(a_rows) > 0,
            F.element_at(a_rows, F.least(F.lit(k), F.size(a_rows)))["__hv"],
        ).alias("__ka"),
        F.least(F.lit(k), F.size(b_rows)).cast("long").alias("__nb"),
        F.when(
            F.size(b_rows) > 0,
            F.element_at(b_rows, F.least(F.lit(k), F.size(b_rows)))["__hv"],
        ).alias("__kb"),
    )

    def _est(n_col: str, kth_col: str):
        # identical arithmetic to the original estimator: exact count
        # below k, else (k-1)*2^60 div kth (integral div -> long)
        return (
            F.when(F.col(n_col) < k, F.col(n_col))
            .otherwise(
                F.expr(
                    f"CAST({k - 1} AS DECIMAL(38,0)) * {HASH_SPACE}"
                    f" div {kth_col}"
                )
            )
            .cast("long")
        )

    u = g.select(
        group_col,
        "n_kept_union",
        _est("__na", "__ka").alias("est_a"),
        _est("__nb", "__kb").alias("est_b"),
        _est("n_kept_union", "__kth").alias("est_union"),
        "k_intersect",
    )
    return u.select(
        group_col,
        "n_kept_union",
        F.coalesce("est_a", F.lit(0)).alias("est_a"),
        F.coalesce("est_b", F.lit(0)).alias("est_b"),
        "est_union",
        "k_intersect",
        F.expr("CAST(1000000 AS DECIMAL(38,0)) * k_intersect div n_kept_union")
        .cast("long")
        .alias("jaccard_ppm"),
        F.expr(
            "CAST(est_union AS DECIMAL(38,0)) * k_intersect div n_kept_union"
        )
        .cast("long")
        .alias("est_intersect"),
    )


def kmv_sketch_rows(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """The raw sketch relation (group, __hv): the k minimum distinct
    hashes per group — what you persist per corpus shard and later
    feed to ``kmv_merge``. ≤ k rows per group regardless of input
    size."""
    from bubbles.operators.similarity import salted_topk_per_key

    hashed = (
        df.select(F.col(group_col), kmv_hash(F.col(value_col)).alias("__hv"))
        .filter(F.col("__hv").isNotNull())
        .distinct()
    )
    return salted_topk_per_key(hashed, group_col, [F.col("__hv")], k)


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    qs_ppm: list[int] | None = None,
    k: int = 1024,
) -> DataFrame:
    """Deterministic per-group quantile estimates from a bottom-k
    HASH-RANK sample — the engine-portable answer to
    ``approxQuantile`` (whose Greenwald-Khanna sketch no other engine
    reproduces, so it can't be twin-checked or merged off-Spark).

    Rows are sampled by taking the k smallest 60-bit md5 hashes of
    ``id_col`` per group: a uniform, seedless, ENGINE-INDEPENDENT
    sample that any system with md5 reproduces bit-for-bit, and that
    merges across shards exactly like the KMV sketch (bottom-k of a
    union of bottom-k sets). Quantile q is the lower order statistic
    of the sample: index ``(q_ppm * (m-1)) div 1_000_000`` with ties
    broken by the hash — all integer arithmetic, so the DuckDB twin
    is bit-identical. Sampling error ~ sqrt(q(1-q)/k) per group
    (~1.6% at the p50 with k=1024); groups with <= k rows are EXACT.

    Scale shape: one salted bottom-k (no group ever sorts more than
    32*k survivor rows in one place), then windows over <= k-row
    samples. A 10^10-row group costs the same final work as a
    10^4-row group. Output: (group, q_ppm, n_sample, value)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    qs_ppm = qs_ppm or [500_000, 900_000, 990_000]
    if not all(0 <= q <= 1_000_000 for q in qs_ppm):
        raise ValueError(f"qs_ppm must be in [0, 1e6]: {qs_ppm}")
    if len(set(qs_ppm)) != len(qs_ppm):
        raise ValueError(f"duplicate quantiles: {qs_ppm}")
    from pyspark.sql import Window

    from bubbles.operators.similarity import salted_topk_per_key

    sampled = salted_topk_per_key(
        df.select(
            F.col(group_col),
            kmv_hash(F.col(id_col)).alias("__hv"),
            F.col(value_col).alias("__v"),
        ).filter(F.col("__hv").isNotNull() & F.col("__v").isNotNull()),
        group_col,
        # __v in the ordering too: a DUPLICATE id (same hash) carrying
        # two different values straddling the k boundary would
        # otherwise be retained by partition arrival order —
        # nondeterministic and un-twinnable. (__hv, __v) is a total
        # order over the retained columns, so the cut is exact.
        [F.col("__hv"), F.col("__v")],
        k,
    )
    w = Window.partitionBy(group_col).orderBy("__v", "__hv")
    ranked = sampled.select(
        group_col,
        "__v",
        (F.row_number().over(w) - 1).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("n_sample"),
    )
    targets = F.array(*[F.lit(int(q)) for q in qs_ppm])
    picked = ranked.select(
        group_col,
        "__v",
        "__rn",
        "n_sample",
        F.explode(targets).alias("q_ppm"),
    ).filter(
        F.col("__rn")
        == F.expr("CAST(q_ppm AS DECIMAL(38,0)) * (n_sample - 1) div 1000000")
    )
    return picked.select(
        group_col,
        F.col("q_ppm").cast("long").alias("q_ppm"),
        F.col("n_sample").cast("long").alias("n_sample"),
        F.col("__v").alias("value"),
    )
