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

from bubbles.functions.distances import dot, norm


def _cos_sim(a, b):
    den = norm(a) * norm(b)
    return F.when(den == 0, F.lit(0.0)).otherwise(dot(a, b) / den)


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


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    planes: int = 6,
    tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors: union candidates from
    ``tables`` independent LSH tables (equi-join per bucket), then
    exact rank within candidates."""
    dim = len(df.select(vec_col).first()[0])
    cand = None
    for t in range(tables):
        b = lsh_bucket(df, dim, planes, seed, t, id_col, vec_col)
        a = b.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket")
        c = b.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket")
        p = a.join(c, on="bucket").filter(F.col("query_id") != F.col("neighbor_id")).select(
            "query_id", "neighbor_id", "__qv", "__cv"
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    sim = _cos_sim(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        cand.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: bucket the corpus by nearest
    centroid (deterministic hash-rank sample as centroids — one
    k-means-assign step), probe each query's ``n_probe`` nearest
    centroid buckets, exact-rank within candidates. The candidate
    join is an equi-join on centroid id; corpus is scanned once for
    assignment (broadcast centroids, no shuffle) and once per probe
    match (shuffle bounded by bucket sizes)."""
    from bubbles.operators.nearest import nearest_representative
    from bubbles.operators.sampling import stratified_sample_exact

    base = df.select(
        F.col(id_col).alias("point_id"),
        F.col(vec_col).cast("array<double>").alias("features"),
        F.lit(0).alias("subset_id"),
    )
    cents = stratified_sample_exact(
        base, "subset_id", 0.0, seed=seed, min_per_key=n_centroids
    )
    assigned = nearest_representative(base, cents, metric="cosine").select(
        F.col("point_id").alias("neighbor_id"),
        F.col("features").alias("__cv"),
        F.col("bubble_id").alias("centroid"),
    )
    # each query probes its n_probe nearest centroids
    c = cents.select(
        F.col("point_id").alias("centroid"), F.col("features").alias("__cf")
    )
    qsim = _cos_sim(F.col("features"), F.col("__cf"))
    w = Window.partitionBy("point_id").orderBy(F.desc("__qcs"), "centroid")
    probes = (
        base.crossJoin(F.broadcast(c))
        .select(
            F.col("point_id").alias("query_id"),
            F.col("features").alias("__qv"),
            "centroid",
            qsim.alias("__qcs"),
        )
        .withColumn("point_id", F.col("query_id"))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "__qv", "centroid")
    )
    cand = probes.join(assigned, on="centroid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = _cos_sim(F.col("__qv"), F.col("__cv"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        cand.select("query_id", "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (a < b) with cosine ≥ threshold —
    brute-force variant (broadcast); swap in lsh_topk candidates at
    scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("__a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("__b"))
    sim = _cos_sim(F.col("__a"), F.col("__b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
