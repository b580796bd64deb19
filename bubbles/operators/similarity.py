"""Similarity search over embedding columns (north-star scope).

* ``cosine_topk``: brute-force top-k neighbors — broadcast join +
  windowed rank. The correctness baseline.
* ``lsh_topk``: random-hyperplane LSH bucketing (sign bits of fixed
  seeded projections) + per-bucket search — the scale path: the
  candidate join is an equi-join on the bucket signature, never a
  cross join. Recall < 1 by construction; mitigated by multiple
  tables.
* ``embedding_cosine_dedup_pairs``: near-duplicate pairs above a
  cosine threshold.

Projections are seeded deterministic integers (splitmix-style mixing
of (seed, table, plane, dim)) so results are reproducible without a
shared random state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from bubbles.functions.distances import dot, norm


def _cos_sim(a, b):
    den = norm(a) * norm(b)
    return F.when(den == 0, F.lit(0.0)).otherwise(dot(a, b) / den)


# DoubleType() (not the DDL string "double") so importing this module
# never needs an active SparkSession to parse the return type.
@F.pandas_udf(DoubleType())
def _cos_sim_arrow(a, b):
    """Arrow-vectorized cosine similarity (rounded to 6dp for stable
    rank ordering). The column-expression twin ``_cos_sim`` evaluates
    the higher-order dot per element interpreted — fine for small
    oracle queries, ~100× too slow on millions of candidate pairs;
    this batches through numpy."""
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.asarray(a.tolist(), dtype=np.float64)
    B = np.asarray(b.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    sim = np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den))
    return pd.Series(np.round(sim, 6))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact top-k by cosine
    similarity (self-matches excluded); ties break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    )
    # rank on similarity rounded to 6dp (id tie-break): float noise in
    # the 1e-7 tail differs between engines/accumulation orders, so an
    # unrounded ordering key can flip ranks vs an external oracle
    sim = F.round(_cos_sim(F.col("__qv"), F.col("__cv")), 6)
    pairs = (
        q.crossJoin(F.broadcast(c))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _projection(dim: int, planes: int, seed: int, table: int):
    """Deterministic pseudo-random hyperplanes as literal arrays —
    tiny (planes × dim) and baked into the plan, no driver state."""
    def mix(*xs: int) -> float:
        h = 0x9E3779B97F4A7C15
        for x in xs:
            h = (h ^ (x * 0xBF58476D1CE4E5B9)) & 0xFFFFFFFFFFFFFFFF
            h = ((h >> 27) ^ h) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        return ((h >> 11) / float(1 << 53)) * 2.0 - 1.0

    return [[mix(seed, table, p, d) for d in range(dim)] for p in range(planes)]


def lsh_bucket(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    seed: int = 42,
    table: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vector, bucket) — sign-bit signature of ``planes`` seeded
    hyperplane projections."""
    proj = _projection(dim, planes, seed, table)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for p, plane in enumerate(proj):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(v, lit_plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.select(F.col(id_col), v.alias(vec_col), bucket.alias("bucket"))


def lsh_bucket_probes(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    seed: int = 42,
    table: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Multi-probe bucketing (Lv et al., VLDB 2007): one row per
    (id, probe bucket) — the row's own sign-bit bucket plus the
    buckets reached by flipping the ``n_probes - 1`` LOWEST-MARGIN
    sign bits (|projection| smallest = the bits most likely wrong for
    a true near neighbor). All column expressions: the margins sort
    in an ``array_sort`` over (|dot|, bit) structs, and the flips are
    XOR against a literal mask table — no UDF, no shuffle; the output
    explodes to ``n_probes`` rows per input row."""
    if n_probes <= 1:
        return lsh_bucket(df, dim, planes, seed, table, id_col, vec_col)
    proj = _projection(dim, planes, seed, table)
    v = F.col(vec_col).cast("array<double>")
    dots = [
        dot(v, F.array(*[F.lit(x) for x in plane])) for plane in proj
    ]
    bucket = F.lit(0)
    for p, d in enumerate(dots):
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    margins = F.array(
        *[
            F.struct(F.abs(dots[p]).alias("m"), F.lit(p).alias("p"))
            for p in range(planes)
        ]
    )
    flips = F.slice(F.array_sort(margins), 1, min(n_probes - 1, planes))
    masks = F.array(*[F.lit(1 << i) for i in range(planes)])
    staged = df.select(
        F.col(id_col), v.alias(vec_col), bucket.alias("__b0"), flips.alias("__fl")
    )
    probes = F.concat(
        F.array(F.col("__b0")),
        F.transform(
            F.col("__fl"),
            lambda s: F.col("__b0").bitwiseXOR(F.element_at(masks, s["p"] + 1)),
        ),
    )
    return staged.select(
        F.col(id_col), F.col(vec_col), F.explode(probes).alias("bucket")
    )


def lsh_bucket_probes_global(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    seed: int = 42,
    tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    total_probes: int = 6,
    max_flip_bits: int = 1,
) -> DataFrame:
    """Budget-allocated multi-probe across ALL tables (Lv et al.,
    VLDB 2007 — their query-directed probing spends a single probe
    budget on the perturbations with the lowest cost, rather than a
    fixed count per table): one row per (id, table, probe bucket).
    Every row probes its base bucket in each of the ``tables`` tables;
    the remaining ``total_probes - tables`` probes go to the bit-flip
    perturbations with the globally smallest summed |projection|
    margin across all (table, mask) pairs — concentrating probes on
    the tables where the signature is least certain instead of
    flipping ``n_probes - 1`` bits uniformly per table.

    ``max_flip_bits=2`` adds the 2-bit perturbations (score = sum of
    the two flipped margins, Lv et al.'s perturbation-set expansion):
    single-bit-only probing saturates at ``tables * (planes + 1)``
    reachable buckets, which an 8-probe budget already exhausts at
    planes=6 — 2-bit masks raise the per-table reachable set to
    ``1 + planes + C(planes, 2)`` so a bigger budget keeps buying
    recall. All column expressions (one ``array_sort`` over the
    (score, table, mask) structs, XOR against literal masks) — no
    UDF, no shuffle; output explodes to ``total_probes`` rows per
    input row (fewer if the budget exceeds the reachable set)."""
    from itertools import combinations

    if max_flip_bits not in (1, 2):
        raise ValueError(f"max_flip_bits must be 1 or 2, got {max_flip_bits}")
    v = F.col(vec_col).cast("array<double>")
    per_table_buckets = []
    margin_structs = []
    n_masks = 0
    for t in range(tables):
        proj = _projection(dim, planes, seed, t)
        dots = [dot(v, F.array(*[F.lit(x) for x in plane])) for plane in proj]
        bucket = F.lit(0)
        for p, d in enumerate(dots):
            bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        per_table_buckets.append(bucket)
        abs_dots = [F.abs(d) for d in dots]
        masks_scores = [((1 << p), abs_dots[p]) for p in range(planes)]
        if max_flip_bits >= 2:
            masks_scores += [
                ((1 << p) | (1 << q), abs_dots[p] + abs_dots[q])
                for p, q in combinations(range(planes), 2)
            ]
        n_masks = len(masks_scores)  # same for every table
        for mask, score in masks_scores:
            margin_structs.append(
                F.struct(
                    score.alias("m"),
                    F.lit(t).alias("t"),
                    F.lit(mask).alias("k"),
                )
            )
    extra = max(0, min(total_probes - tables, tables * n_masks))
    # slice(.., 1, 0) is a correctly-typed empty array, so extra=0
    # degrades to plain one-bucket-per-table bucketing
    flips = F.slice(F.array_sort(F.array(*margin_structs)), 1, extra)
    staged = df.select(
        F.col(id_col),
        v.alias(vec_col),
        *[per_table_buckets[t].alias(f"__b{t}") for t in range(tables)],
        flips.alias("__fl"),
    )
    tbl_buckets = F.array(*[F.col(f"__b{t}") for t in range(tables)])
    base = [
        F.struct(F.lit(t).alias("tbl"), F.col(f"__b{t}").alias("bucket"))
        for t in range(tables)
    ]
    flipped = F.transform(
        F.col("__fl"),
        lambda s: F.struct(
            s["t"].alias("tbl"),
            F.element_at(tbl_buckets, s["t"] + 1)
            .bitwiseXOR(s["k"])
            .alias("bucket"),
        ),
    )
    probes = F.concat(F.array(*base), flipped)
    return staged.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(probes).alias("__pr"),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__pr.tbl").alias("__tbl"),
        F.col("__pr.bucket").alias("bucket"),
    )


def _require_integral_ids(df: DataFrame, id_col: str, op: str) -> None:
    """The ANN scale paths ship ids through numpy int64 kernels and
    long-typed Arrow schemas; a string id that the brute-force
    baseline happily ranks would otherwise die as an opaque cast error
    deep in an executor. Fail fast on the driver instead."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(
        dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        raise TypeError(
            f"{op} requires an integral {id_col!r} (the bucket kernels "
            f"score ids as int64); got {dt.simpleString()} — hash or "
            "zip your ids to longs first (cosine_topk has no such "
            "restriction)"
        )


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    planes: int | None = None,
    tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 4096,
    dim: int | None = None,
    queries: DataFrame | None = None,
    n_probes: int = 1,
    probe_alloc: str = "per_table",
) -> DataFrame:
    """Approximate top-k cosine neighbors: union candidates from
    ``tables`` independent LSH tables (equi-join per bucket), then
    exact rank within candidates.

    ``n_probes`` > 1 switches the QUERY side to multi-probe (Lv et
    al., VLDB 2007): each query also searches the buckets reached by
    flipping its lowest-margin sign bits, multiplying candidates (and
    per-table scoring work) by ~n_probes without growing the index.
    This is the recall lever for weakly-clustered embedding spaces
    where single-probe hyperplane LSH degrades toward random
    bucketing — measured on the deliberately hard testdata corpus:
    recall@10 0.14 (1 probe) -> 0.41 (4) -> 0.55 (8 probes) vs IVF's
    0.72, while the wall time FELL 6.7 -> 4.3 s (denser candidate
    buckets amortize the per-group kernel overhead)
    (tools/pipeline_eval.py). Probes are single-bit flips, so at most
    ``planes + 1`` distinct buckets are reachable — n_probes saturates
    there. The corpus side stays one bucket per row, so index size and
    the max_bucket_size cap are unchanged.

    ``probe_alloc="global"`` keeps the same total probe budget
    (``tables * n_probes``) but allocates the non-base probes across
    tables by GLOBAL perturbation-score order (Lv et al.'s
    query-directed allocation) over 1- AND 2-bit flips: each query
    probes its base bucket in every table plus the
    ``tables * (n_probes - 1)`` perturbations with the smallest
    summed |projection| margin across all (table, mask) pairs.
    Per-table probing saturates at ``planes + 1`` buckets/table
    (every 1-bit flip exhausted — at the auto-sized planes=6 an
    8-probe budget hits that wall, which is why per-table recall
    plateaus at 0.55 on the hard eval corpus); the 2-bit masks raise
    the reachable set to ``1 + planes + C(planes, 2)`` per table so
    the same budget keeps buying recall. Candidate volume and plan
    shape are unchanged — only which buckets get the flip probes
    moves.

    ``queries`` searches the corpus with a SEPARATE query frame (the
    index-and-batch shape): queries are bucketed with the same seeded
    hyperplanes and meet corpus rows in shared buckets. A query whose
    bucket was capped away gets candidates only from the other tables,
    exactly like self-search. Equal ids on both sides are treated as
    the same item and excluded.

    ``max_bucket_size`` drops over-full buckets before the per-bucket
    self-join (its cost is Σ bucket²; one degenerate bucket of b docs
    is b² candidate pairs). Queries living in a dropped bucket still
    get candidates from the other ``tables-1`` independent tables —
    the cap trades a little recall on dense regions for a hard bound
    on join fan-out. Set 0/None to disable.

    ``planes=None`` (default) scales the signature width to the
    corpus: ceil(log2(n/256)) sign bits, floor 6 — targeting ~256-row
    buckets. A FIXED width stops working at scale in both directions:
    too few planes and every bucket outgrows ``max_bucket_size`` (all
    dropped -> zero recall at 10⁹ docs), too many and buckets are
    singletons (no candidates). Explicit ``planes`` skips the count
    job and pins the width (the driver oracle does this). Note the
    floor binds below n≈16k (64 buckets on a 500-row corpus is ~8
    rows each, not 256) — pass a smaller ``planes`` for tiny corpora.

    Pass ``dim`` to avoid the one-row inference job (``first()``)
    per invocation.

    Rows with a NULL vector are excluded up front (a crawl corpus
    has them; np.stack inside the scoring kernel would throw on the
    whole batch otherwise)."""
    _require_integral_ids(df, id_col, "lsh_topk")
    df = df.filter(F.col(vec_col).isNotNull())
    if queries is not None:
        queries = queries.filter(F.col(vec_col).isNotNull())
    if dim is None:
        row = df.select(vec_col).first()
        if row is None:  # empty / all-NULL corpus: zero rows, like
            spark = df.sparkSession  # the brute-force baseline
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, rank int"
            )
        dim = len(row[0])
    # a single-file corpus arrives in one split; the per-row bucket
    # projections (tables × planes × dim aggregate expressions) would
    # then run on one core. Unconditional round-robin repartition of
    # the slim (id, vec) rows — same pattern as minhash_lsh_pairs
    # (dedup.py): reading the split count via df.rdd.getNumPartitions()
    # would force a DataFrame->RDD plan conversion just to decide, and
    # at scale one extra narrow shuffle is noise next to the bucket
    # projections it parallelizes.
    # localCheckpoint (round 11, guide §2.4): the corpus base is
    # referenced 2-3 times PER TABLE (bucket cap count, join side,
    # self-search query side) and Catalyst does not CSE shared
    # subtrees — lazily the whole upstream scan re-executed up to 12x
    # in one 3-table plan (measured on the catalog query: 12 parquet
    # scans / 32 exchanges; 0 re-scans after this one cut). The cut
    # rides the repartition shuffle it was paying anyway. Only the
    # BASE is cut — per-table capped-bucket checkpoints were tried and
    # rejected: they serialize the tables' pipelines, which Spark
    # otherwise schedules concurrently inside the one union job
    # (measured +30% wall at sf0.1).
    # Lifecycle (ADVICE r11): the checkpointed blocks (base, query
    # frame, probe frame) stay pinned until the corresponding Python
    # frames are garbage-collected — they CANNOT be unpersisted here
    # because the returned lazy plan still reads them on every
    # execution. Long-lived drivers that call this operator in a loop
    # should drop result references between rounds (bench.py /
    # tools/check_oracle.py settle leftover persistent RDDs
    # synchronously for exactly this reason); checkpointed blocks are
    # also non-recomputable on executor loss — acceptable for these
    # within-query intermediates, which any retry rebuilds from source
    # by re-running the query.
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(par).localCheckpoint()
    if queries is not None:
        # same disease on the query side: bucketed once per table
        queries = queries.localCheckpoint()
    if planes is None:
        import math

        # the count now reads the materialized base — no extra scan
        planes = max(6, math.ceil(math.log2(max(df.count(), 2) / 256)))
    # per-(table, bucket) scoring in a self-cogroup kernel instead of a
    # per-bucket self-JOIN: the join materialized every candidate pair
    # carrying both vectors (|bucket|² rows x 2 vectors of Arrow+shuffle
    # volume); the cogroup ships each bucket's rows once, takes the
    # all-pairs dot products in numpy, and emits only slim per-query
    # top-k rows. Per-bucket top-k provably contains the global top-k
    # (a neighbor beaten by k same-bucket candidates is beaten by k
    # distinct neighbors globally), so dedup + global rank over the
    # slim union selects identical rows.
    scored = None
    probe_frame = None
    if probe_alloc not in ("per_table", "global"):
        raise ValueError(
            f"probe_alloc must be 'per_table' or 'global', got {probe_alloc!r}"
        )
    for t in range(tables):
        b = lsh_bucket(df, dim, planes, seed, t, id_col, vec_col)
        if max_bucket_size:
            small = (
                b.groupBy("bucket")
                .agg(F.count("*").alias("__bn"))
                .filter(F.col("__bn") <= max_bucket_size)
                .select("bucket")
            )
            b = b.join(small, on="bucket")
        # rename the key on one side: a self-cogroup on the SAME
        # attribute trips the ambiguous-self-join check (cogroup keys
        # align positionally, names need not match)
        if n_probes > 1 and probe_alloc == "global":
            if probe_frame is None:
                # materialized once: the probe frame is filtered per
                # table, which would re-run the full perturbation
                # scoring per reference
                probe_frame = lsh_bucket_probes_global(
                    df if queries is None else queries,
                    dim, planes, seed, tables, id_col, vec_col,
                    total_probes=tables * n_probes,
                    max_flip_bits=2,
                ).localCheckpoint()
            qsrc = probe_frame.filter(F.col("__tbl") == t).drop("__tbl")
        elif n_probes > 1:
            qsrc = lsh_bucket_probes(
                df if queries is None else queries,
                dim, planes, seed, t, id_col, vec_col, n_probes,
            )
        elif queries is None:
            qsrc = b
        else:
            qsrc = lsh_bucket(queries, dim, planes, seed, t, id_col, vec_col)
        q = qsrc.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
        )
        m = b.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col("bucket").alias("__mbucket"),
        )
        s = (
            q.groupBy("bucket")
            .cogroup(m.groupBy("__mbucket"))
            .applyInPandas(
                _score_bucket_topk(k),
                schema="query_id long, neighbor_id long, cos_sim double",
            )
        )
        scored = s if scored is None else scored.unionByName(s)
    scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def salted_topk_per_key(
    df: DataFrame, key_col: str, order_cols: list, k: int, n_salts: int = 32
) -> DataFrame:
    """Skew-safe exact top-k per key: a per-(key, salt) pre-rank keeps
    each salt partition's top k, then the final per-key rank runs over
    at most ``n_salts·k`` survivors per key — a hard bound independent
    of data skew (a hot key never lands its full group in one window
    partition). Same rows as a single per-key ``row_number`` window.
    Shared by the IVF inverted-list cap and splits.source_quota."""
    salt = F.pmod(F.xxhash64(*order_cols), F.lit(n_salts))
    w1 = Window.partitionBy(key_col, "__salt").orderBy(*order_cols)
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= k)
        .drop("__salt", "__r1", "__r2")
    )


# back-compat alias (tests/tools imported the underscored name)
_salted_topk_per_key = salted_topk_per_key


def _ivf_assign_probe(
    base: DataFrame, cids, cmat, n_probe: int
) -> DataFrame:
    """(point_id, features, centroid, rep_dist, probes): nearest
    centroid + distance (inverted-list side — dist argmin, SMALLEST
    CENTROID ID wins ties) and the n_probe nearest centroids (query
    side — 6dp-rounded cosine desc, centroid id asc, matching the
    former crossJoin + window ordering), from one numpy pass over
    the point-x-centroid matrix. No shuffle; centroids ride a
    broadcast variable.

    The two tie-breaks MUST agree: with them inconsistent (r5 bug,
    caught by the all-identical-vectors degenerate test), a fully
    tied corpus assigned every point to the sample-priority-first
    centroid while probing the id-ascending ones — disjoint sets, so
    self-search returned ZERO rows. Under id-asc ties the assigned
    centroid is always the first probe."""
    import numpy as np
    import pandas as pd

    bc = base.sparkSession.sparkContext.broadcast((cids, cmat))
    n_probe_eff = min(n_probe, len(cids))

    # row-chunk budget: keep the point-x-centroid similarity matrix
    # at <= 8M cells (64 MB of float64). At the usual centroid counts
    # (<= ~800) a whole 10k-row Arrow batch fits in one chunk, so
    # nothing changes; at the auto-sized k of a multi-million-row
    # corpus (11881 at 2.4M rows) an unchunked 10k x 11881 matrix is
    # ~1 GB, and this class of host falls off a measured cliff on
    # ~GB-sized buffers (np.round: 0.4 s at 330 MB vs 72 s at 950 MB;
    # per-worker rss 2.4 GB x 32 workers = the round-9 OOM) — chunked,
    # the same work runs at full speed in ~200 MB per worker.
    _CELLS = 8_000_000
    chunk_rows = max(1, _CELLS // max(1, len(cids)))

    def gen(it):
        ids, mat = bc.value
        # id-sorted column view for the probe tie-break (centroid id
        # asc under a stable desc-sim argsort); assignment keeps the
        # original priority order
        perm = np.argsort(ids)
        ids_sorted = ids[perm]
        for whole in it:
            for s in range(0, len(whole), chunk_rows):
                pdf = whole.iloc[s : s + chunk_rows]
                if len(pdf) == 0:
                    continue
                yield from _one(pdf, ids, mat, perm, ids_sorted)

    def _one(pdf, ids, mat, perm, ids_sorted):
        X = _vec_matrix(pdf["features"])
        # hoisted row norms: _rows_cosine recomputes
        # ONE point-x-centroid similarity matrix drives BOTH the
        # assignment and the probes, through the SAME ordering key
        # (6dp-rounded cosine desc, centroid id asc): the assigned
        # centroid IS probes[0] by construction. The former split
        # derivation (unrounded-distance argmin loop for
        # assignment, rounded-sim argsort for probes) could
        # diverge on near-ties (<5e-7 apart round equal; the two
        # sides also took different BLAS paths with last-ulp
        # drift), leaving a point whose own inverted list is never
        # probed — the zero-candidate failure class the r5 fully-
        # tied bug was about, surviving in its near-tie form.
        Xn = np.sqrt(np.einsum("ij,ij->i", X, X))
        num = X @ mat.T
        den = Xn[:, None] * np.linalg.norm(mat, axis=1)[None, :]
        sim = np.round(
            np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den)), 6
        )
        simp = sim[:, perm]  # id-ascending column view
        if n_probe_eff == 1:
            # argmax = first occurrence of the max = smallest
            # centroid id under the perm view — identical to the
            # stable desc argsort's first element, without sorting
            # all k columns (the sort dominated the kernel at
            # k=1600: 0.70s -> 0.05s per 3100-row batch)
            top = np.argmax(simp, axis=1)[:, None]
        else:
            top = np.argsort(-simp, axis=1, kind="stable")[
                :, :n_probe_eff
            ]
        best_i = perm[top[:, 0]]
        # rep_dist (inverted-list cap ordering): UNROUNDED cosine
        # distance to the assigned centroid
        rows = np.arange(len(X))
        den_a = den[rows, best_i]
        with np.errstate(divide="ignore", invalid="ignore"):
            best_d = np.where(
                den_a == 0.0, 1.0, 1.0 - num[rows, best_i] / den_a
            )
        yield pd.DataFrame(
            {
                "point_id": pdf["point_id"],
                # packed float64 bytes: the vector payload crosses
                # the scoring shuffle as BINARY, which unpacks via
                # one frombuffer instead of a per-row list walk
                "features": [X[i].tobytes() for i in range(len(X))],
                "centroid": ids[best_i],
                "rep_dist": best_d,
                "probes": [r.tolist() for r in ids_sorted[top]],
            }
        )

    return base.select("point_id", "features").mapInPandas(
        gen,
        schema=(
            "point_id long, features binary, centroid long, "
            "rep_dist double, probes array<long>"
        ),
    )


def _vec_matrix(col):
    """Object column of vectors -> (n, d) float64 matrix. Accepts
    array cells (LSH path) or packed float64 bytes (IVF path — binary
    skips the per-row list conversion, ~10x faster at 200k rows)."""
    import numpy as np

    v0 = col.iloc[0]
    if isinstance(v0, (bytes, bytearray)):
        return np.frombuffer(b"".join(col), dtype=np.float64).reshape(len(col), -1)
    return np.array([np.asarray(v, dtype=np.float64) for v in col])


def _score_bucket_topk(k: int):
    """Cogroup kernel shared by the IVF and LSH paths: (query rows
    with __qv) x (member rows with __cv) for one bucket -> per-query
    top-k within the bucket by (6dp cosine desc, neighbor id asc),
    self-matches excluded — the same ordering a candidate join + global
    window would use, so the downstream global rank selects identical
    rows."""

    def score(qpdf, mpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(qpdf) == 0 or len(mpdf) == 0:
            return empty
        Q = _vec_matrix(qpdf["__qv"])
        M = _vec_matrix(mpdf["__cv"])
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        nids = mpdf["neighbor_id"].to_numpy(dtype=np.int64)
        order_n = np.argsort(nids)  # id-asc columns => stable tie-break
        M = M[order_n]
        nids = nids[order_n]
        mnorm = np.linalg.norm(M, axis=1)[None, :]
        outs = []
        # block the query side so the sim matrix stays ~32 MB even for
        # a max_bucket_size x max_bucket_size bucket
        for lo in range(0, len(Q), 1024):
            Qb = Q[lo : lo + 1024]
            qb_ids = qids[lo : lo + 1024]
            num = Qb @ M.T
            den = np.linalg.norm(Qb, axis=1)[:, None] * mnorm
            sim = np.round(
                np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den)), 6
            )
            kk = min(k + 1, sim.shape[1])  # +1 absorbs the possible self-match
            top = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
            simt = np.take_along_axis(sim, top, axis=1)
            nt = nids[top]
            keep = nt != qb_ids[:, None]
            keep &= np.cumsum(keep, axis=1) <= k
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qb_ids, keep.sum(axis=1)),
                        "neighbor_id": nt[keep],
                        "cos_sim": simt[keep],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return score


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 4096,
    centroid_ids: list | None = None,
    queries: DataFrame | None = None,
    n_salts: int = 4,
    n_rows: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: bucket the corpus by nearest
    centroid (deterministic hash-rank sample as centroids — one
    k-means-assign step), probe each query's ``n_probe`` nearest
    centroid buckets, exact-rank within candidates. The candidate
    join is an equi-join on centroid id; corpus is scanned once for
    assignment (broadcast centroids + mapInPandas numpy argmin — the
    vectorized Arrow path, ~100× faster than the interpreted
    higher-order-function projection at corpus scale) and once per
    probe match (shuffle bounded by bucket sizes).

    ``max_bucket_size`` bounds each centroid's inverted list to its
    closest members (rep_dist rank) via a salted two-phase top-k so a
    hot centroid can't make the probe join quadratic NOR concentrate
    its whole inverted list in one window partition.

    ``centroid_ids`` pins the centroids to explicit corpus ids
    instead of the seeded hash-rank sample — fully SQL-expressible
    centroid choice (used by the DuckDB oracle twin). Assignment AND
    probe ties both break toward the smallest centroid id, so a tied
    point always probes its own inverted list (see
    ``_ivf_assign_probe``).

    ``queries`` searches the corpus with a SEPARATE query frame (same
    id/vec columns) — the index-and-batch shape: inverted lists come
    from ``df``, probes from ``queries``. Rows with equal ids on both
    sides are treated as the same item and excluded, matching the
    self-search semantics. Default (None) is self-search over ``df``."""
    _require_integral_ids(df, id_col, "ivf_topk")
    if queries is not None:
        queries = queries.filter(F.col(vec_col).isNotNull())
    cids, cmat, both, assigned = _ivf_build(
        df,
        n_centroids=n_centroids,
        n_probe_corpus=n_probe if queries is None else 1,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket_size=max_bucket_size,
        centroid_ids=centroid_ids,
        n_rows=n_rows,
    )
    if queries is not None:
        par = df.sparkSession.sparkContext.defaultParallelism
        qbase = queries.select(
            F.col(id_col).alias("point_id"),
            F.col(vec_col).cast("array<double>").alias("features"),
        )
        qn = n_queries if n_queries is not None else qbase.count()
        qwidth = min(par, max(1, -(-qn // 50_000)))
        if -(-qn // 50_000) <= par:
            qbase = qbase.repartition(qwidth)
        both = _ivf_assign_probe(qbase, cids, cmat, n_probe).localCheckpoint()
    return _ivf_score(both, assigned, k, n_salts)


def _ivf_build(
    df: DataFrame,
    n_centroids: int,
    n_probe_corpus: int,
    seed: int,
    id_col: str,
    vec_col: str,
    max_bucket_size: int,
    centroid_ids: list | None,
    n_rows: int | None,
):
    """The BUILD half of ``ivf_topk`` (also the savable artifact behind
    the persisted predict index, bubbles/plans/predict.py): centroid
    selection + one assignment pass + the salted inverted-list cap.
    Returns ``(cids, cmat, both, assigned)`` — centroid driver arrays,
    the checkpointed assignment kernel output (carries probes when
    ``n_probe_corpus`` > 1: the self-search shape), and the capped
    inverted lists (neighbor_id, __cv binary, centroid)."""
    import numpy as np

    from bubbles.operators.sampling import stratified_sample_exact

    # NULL-vector rows excluded (same contract as lsh_topk: np.stack
    # in the assignment kernel would throw on the whole Arrow batch)
    df = df.filter(F.col(vec_col).isNotNull())
    base = df.select(
        F.col(id_col).alias("point_id"),
        F.col(vec_col).cast("array<double>").alias("features"),
        F.lit(0).alias("subset_id"),
    )
    # width the assignment kernel to the DATA, not the core count: a
    # Python/Arrow task costs ~100 ms of dispatch regardless of size,
    # so 32 near-empty partitions × several kernel stages dwarf the
    # actual numpy work on a small corpus. Target ~50k rows per task,
    # capped at the core count; at scale the scan's own split count
    # already exceeds the target and this never coalesces it.
    # callers that already know the corpus size pass n_rows and skip
    # this count job (the only pre-stage driver job in this operator)
    if n_rows is None:
        n_rows = base.count()
    par = df.sparkSession.sparkContext.defaultParallelism
    width = min(par, max(1, -(-n_rows // 50_000)))
    # only pin the width while the data-derived target is at or below
    # the core count (small corpus: coalescing to `width` tasks is
    # harmless and widens a single-split scan). A big corpus keeps the
    # scan's natural splits — and the decision comes from n_rows, not
    # df.rdd.getNumPartitions(), which would force a DataFrame->RDD
    # plan conversion just to read the split count.
    if -(-n_rows // 50_000) <= par:
        base = base.repartition(width)
    # centroids are driver-bounded (n_centroids rows) — same bounded
    # collect pattern as fit()'s sample lists
    if centroid_ids is not None:
        ord_of = {int(p): i for i, p in enumerate(centroid_ids)}
        crows = sorted(
            base.filter(F.col("point_id").isin([int(x) for x in centroid_ids]))
            .select("point_id", "features")
            .collect(),
            key=lambda r: ord_of[int(r.point_id)],
        )
    else:
        cents = stratified_sample_exact(
            base, "subset_id", 0.0, seed=seed, min_per_key=n_centroids
        )
        crows = sorted(
            cents.select("sample_ord", "point_id", "features").collect(),
            key=lambda r: r.sample_ord,
        )
    # fail fast ON THE DRIVER with the actual cause: an empty/partial
    # centroid set otherwise surfaces as a bare numpy shape error deep
    # in an executor ((0,) @ (n,d).T), or silently trains fewer
    # centroids than the caller asked for
    if centroid_ids is not None:
        found = {int(r.point_id) for r in crows}
        missing = [int(x) for x in centroid_ids if int(x) not in found]
        if missing:
            raise ValueError(
                f"centroid_ids not present in the corpus (or NULL-"
                f"vector-filtered): {missing[:20]}"
                + ("..." if len(missing) > 20 else "")
            )
    elif not crows:
        raise ValueError("cannot sample centroids from an empty corpus")
    cids = np.array([r.point_id for r in crows], dtype=np.int64)
    cmat = np.array([r.features for r in crows], dtype=np.float64)
    # ONE mapInPandas pass computes both roles of the point-x-centroid
    # similarity matrix: the nearest centroid (inverted-list side,
    # identical semantics to nearest_representative_bulk: dist argmin,
    # first-centroid-wins ties) AND the top-n_probe probe centroids
    # (query side, identical ordering to the former crossJoin + window:
    # 6dp-rounded cosine desc, centroid id asc). This replaces a
    # broadcast crossJoin + Arrow udf + window shuffle with numpy work
    # already resident in the assignment kernel.
    # materialize the assignment once (localCheckpoint = the "build the
    # index" step): downstream the kernel output feeds the inverted
    # list, its cap, AND the probe side — uncheckpointed, Spark would
    # re-execute the kernel once per branch (measured 3x at 200k rows)
    # index-and-batch mode reads only the ASSIGNMENT from the corpus
    # pass (probes come from the query-side kernel) — n_probe_corpus=1
    # takes the cheap argmax path and skips materializing an unused
    # n_probe-long array per corpus row through the checkpoint
    both = _ivf_assign_probe(base, cids, cmat, n_probe_corpus).localCheckpoint()
    assigned = both.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("features").alias("__cv"),
        "centroid",
        "rep_dist",
    )
    # the cap can only bind when the corpus outnumbers it (one cheap
    # count action saves two window stages on small corpora); when it
    # does, the rank windows see only slim (centroid, id, dist) rows —
    # never the vector payload — and the vectors come back through an
    # equi-join on the unique id, which cannot skew
    if max_bucket_size and n_rows > max_bucket_size:
        kept = _salted_topk_per_key(
            assigned.select("neighbor_id", "centroid", "rep_dist"),
            "centroid",
            ["rep_dist", "neighbor_id"],
            max_bucket_size,
        ).select("neighbor_id", "centroid")
        assigned = assigned.join(kept, on=["neighbor_id", "centroid"])
    assigned = assigned.drop("rep_dist")
    return cids, cmat, both, assigned


def _ivf_score(
    both: DataFrame, assigned: DataFrame, k: int, n_salts: int
) -> DataFrame:
    """The SCORE half of ``ivf_topk``: probe-bucket cogroup top-k +
    global rank. ``both`` is the query-side assignment kernel output
    (probes populated), ``assigned`` the inverted lists — from the
    in-session build or read back from a persisted predict index."""
    # each query probes its n_probe nearest centroids (computed in the
    # same kernel pass; explode is a narrow transform, no shuffle)
    probes = both.select(
        F.col("point_id").alias("query_id"),
        F.col("features").alias("__qv"),
        F.explode("probes").alias("centroid"),
    )
    # probe-bucket scoring via salted cogroup instead of an equi-join:
    # the join materialized |probes_c| x |members_c| candidate ROWS each
    # carrying BOTH 64-d vectors — ~1 GB of shuffle+Arrow per million
    # candidates just to take dot products. The cogroup ships each
    # centroid's member matrix once per salt, computes the similarity
    # matrix in numpy, and emits only slim per-(query, centroid) top-k
    # rows. The probe-side salt splits a hot centroid's query load
    # across tasks (members replicated n_salts ways, bounded by
    # max_bucket_size) so no single task sees a hot bucket's full load.
    # Per-(query, centroid) top-k provably contains the global top-k: a
    # neighbor beaten by k same-centroid candidates is beaten by those
    # k globally too. n_salts trades member-replication volume (the
    # dominant shuffle: capped list x n_salts x vector width) against
    # per-task probe load on a hot centroid.
    members = assigned.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    probes = probes.withColumn(
        "__salt", F.pmod(F.xxhash64("query_id"), F.lit(n_salts)).cast("int")
    )
    scored = (
        probes.groupBy("centroid", "__salt")
        .cogroup(members.groupBy("centroid", "__salt"))
        .applyInPandas(
            _score_bucket_topk(k), schema="query_id long, neighbor_id long, cos_sim double"
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def choose_index(
    n_rows: int,
    target_recall: float = 0.8,
    streaming_build: bool = False,
    corpus_churn: bool = False,
) -> dict:
    """Which ANN index should I run? — the measured decision rule
    (PIPELINE_EVAL ``ann``/``ann_separable``; SCALE.md "which ANN
    index to pick") as a callable, so users don't have to read the
    eval record to size a search. Returns ``{"index", "kwargs",
    "why"}`` where ``kwargs`` feed ``ivf_topk``/``lsh_topk``/
    ``cosine_topk`` directly.

    The rule, calibrated on the separable eval corpus (recall@10 on a
    seeded 25-cluster unit-norm mixture; the hard barely-separable
    corpus gives every index a lower floor at the same settings):

    * **IVF is the default** (0.87 recall at 8 probes, best
      recall-per-second measured — 2.2 s vs 7–11 s for the LSH
      variants at 500 vecs; it also doubles as the distributed
      predict index) whenever a centroid pass over the corpus is
      affordable: batch builds over a stable corpus.
    * **Global-allocation multi-probe LSH** when the index must be
      built in one streaming pass (no centroid training — one
      projection per row) or the corpus churns too fast to re-train
      centroids, and when the target recall exceeds IVF's measured
      ceiling (global(16) reaches 0.93 vs IVF's 0.87 at comparable
      wall time).
    * **exact** (``cosine_topk``) past 0.93 — no approximate setting
      here is measured to deliver it; pay the brute-force cost or
      relax the target.

    Single-probe LSH (0.24 recall) is deliberately never returned:
    it is only for candidate generation feeding an exact verifier."""
    import math

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    if target_recall > 0.93:
        return {
            "index": "exact",
            "kwargs": {},
            "why": (
                f"target_recall={target_recall} exceeds the best measured "
                f"approximate setting (global multi-probe LSH(16): 0.93 on "
                f"the separable eval corpus) — use cosine_topk, or relax "
                f"the target"
            ),
        }
    if streaming_build or corpus_churn:
        n_probes = 16 if target_recall > 0.79 else 8
        return {
            "index": "lsh",
            "kwargs": {"n_probes": n_probes, "probe_alloc": "global"},
            "why": (
                "no centroid pass available (streaming build / fast-"
                "churning corpus): global-allocation multi-probe LSH "
                f"(measured {'0.93' if n_probes == 16 else '0.79'} "
                f"recall@10 at n_probes={n_probes} on the separable eval "
                "corpus) builds with one projection per row"
            ),
        }
    if target_recall > 0.87:
        return {
            "index": "lsh",
            "kwargs": {"n_probes": 16, "probe_alloc": "global"},
            "why": (
                f"target_recall={target_recall} is past IVF's measured "
                f"ceiling (0.87 at 8 probes): global multi-probe LSH(16) "
                f"reaches 0.93 at comparable wall time"
            ),
        }
    return {
        "index": "ivf",
        "kwargs": {
            "n_centroids": max(16, int(math.sqrt(max(n_rows, 1) / 200)) ** 2),
            "n_probe": 8,
            "n_rows": int(n_rows),
        },
        "why": (
            "stable corpus + affordable centroid pass: IVF at 8 probes "
            "(0.87 recall@10 measured, best recall-per-second; the same "
            "index serves distributed predict)"
        ),
    }


def embedding_cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (a < b) with cosine ≥ threshold —
    brute-force variant (broadcast), the exact correctness baseline;
    ``embedding_cosine_dedup_pairs_lsh`` is the scale path. The
    similarity is rounded to 6dp BEFORE thresholding so the kept set
    is stable across engines/accumulation orders (float noise in the
    1e-7 tail must not flip a boundary pair). NULL-vector rows are
    excluded (ANN-family contract)."""
    df = df.filter(F.col(vec_col).isNotNull())
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("__b"))
    sim = F.round(_cos_sim_arrow(F.col("__a"), F.col("__b")), 6)
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _score_bucket_pairs(threshold: float):
    """Cogroup kernel: emit all intra-bucket pairs (id_a < id_b) with
    6dp-rounded cosine ≥ threshold. Output is sparse (matches only);
    the sim matrix itself is blocked to ~32 MB."""

    def score(qpdf, mpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(qpdf) == 0 or len(mpdf) == 0:
            return empty
        Q = _vec_matrix(qpdf["__qv"])
        M = _vec_matrix(mpdf["__cv"])
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        nids = mpdf["neighbor_id"].to_numpy(dtype=np.int64)
        mnorm = np.linalg.norm(M, axis=1)[None, :]
        outs = []
        for lo in range(0, len(Q), 1024):
            Qb = Q[lo : lo + 1024]
            qb_ids = qids[lo : lo + 1024]
            num = Qb @ M.T
            den = np.linalg.norm(Qb, axis=1)[:, None] * mnorm
            sim = np.round(
                np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den)), 6
            )
            keep = (sim >= threshold) & (qb_ids[:, None] < nids[None, :])
            ii, jj = np.nonzero(keep)
            outs.append(
                pd.DataFrame(
                    {"id_a": qb_ids[ii], "id_b": nids[jj], "cos_sim": sim[ii, jj]}
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return score


def embedding_cosine_dedup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    planes: int | None = None,
    tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 4096,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: candidates come from
    LSH bucket collisions (any of ``tables`` independent tables),
    scored in the self-cogroup kernel, so cost is Σ bucket² numpy
    flops with slim matches out — never an all-pairs join. Recall < 1
    by construction (a pair must collide in ≥1 table); high-cosine
    pairs collide with probability (1 - θ/π)^planes per table, so
    near-dups at 0.95+ are nearly always recovered. Found pairs are
    exact (same 6dp-rounded similarity as the brute-force baseline);
    every returned pair is a true ≥-threshold pair. ``planes=None``
    scales the signature width to the corpus like ``lsh_topk``.
    NULL-vector rows are excluded (ANN-family contract)."""
    df = df.filter(F.col(vec_col).isNotNull())
    if dim is None:
        row = df.select(vec_col).first()
        if row is None:  # empty / all-NULL corpus: zero pairs, like
            spark = df.sparkSession  # the brute-force baseline
            return spark.createDataFrame(
                [], "id_a long, id_b long, cos_sim double"
            )
        dim = len(row[0])
    # single-file corpus arrives in one split — spread the
    # tables x planes x dim bucket projections first (same rationale
    # and shape as lsh_topk / minhash_lsh_pairs). localCheckpoint:
    # the base is re-bucketed per table and Catalyst does not CSE
    # shared subtrees (same round-11 cut as lsh_topk).
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint()
    if planes is None:
        import math

        # the auto-size count reads the just-materialized base instead
        # of re-executing the full upstream pipeline (ADVICE r11 — the
        # exact redundancy lsh_topk's round-11 cut already fixed there)
        planes = max(6, math.ceil(math.log2(max(df.count(), 2) / 256)))
    found = None
    for t in range(tables):
        b = lsh_bucket(df, dim, planes, seed, t, id_col, vec_col)
        if max_bucket_size:
            small = (
                b.groupBy("bucket")
                .agg(F.count("*").alias("__bn"))
                .filter(F.col("__bn") <= max_bucket_size)
                .select("bucket")
            )
            b = b.join(small, on="bucket")
        q = b.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
        )
        m = b.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col("bucket").alias("__mbucket"),
        )
        s = (
            q.groupBy("bucket")
            .cogroup(m.groupBy("__mbucket"))
            .applyInPandas(
                _score_bucket_pairs(threshold),
                schema="id_a long, id_b long, cos_sim double",
            )
        )
        found = s if found is None else found.unionByName(s)
    return found.dropDuplicates(["id_a", "id_b"])
