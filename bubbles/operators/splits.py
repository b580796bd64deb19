"""Deterministic train/validation/test splits (north-star scope: a
training-data pipeline needs reproducible, engine-independent dataset
splits that never depend on row order or partitioning).

The bucket is the first 8 hex digits of md5 of the string id, mod 100
— a pure projection (zero shuffle, trivially parallel at any scale)
that any engine can replay exactly (the DuckDB twin uses
``CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 100``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_long(id_col: Column) -> Column:
    """The ONE md5-prefix-to-long recipe every hash-derived ordering /
    bucketing in this module uses (first 8 hex chars of the md5 of the
    stringified id, as a long). Factored so the recipe (prefix width,
    cast) can never drift between the split / packing / quota /
    mixture paths — the DuckDB twins replay it verbatim."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def md5_bucket(id_col: Column, mod: int) -> Column:
    """Stable [0, mod) bucket from :func:`md5_long`."""
    return md5_long(id_col) % mod


def split_bucket(id_col: Column) -> Column:
    """Stable [0, 100) bucket from the md5 of the stringified id."""
    return md5_bucket(id_col, 100)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    cuts: tuple = (80, 90),
    names: tuple = ("train", "val", "test"),
) -> DataFrame:
    """Adds ``bucket`` (0-99) and ``split`` columns. ``cuts`` are the
    exclusive upper bucket bounds of all but the last split: the
    default (80, 90) yields 80/10/10 train/val/test."""
    if len(cuts) != len(names) - 1:
        raise ValueError("need exactly one cut per split boundary")
    b = split_bucket(F.col(id_col))
    expr = F.lit(names[-1])
    for cut, name in zip(reversed(cuts), reversed(names[:-1])):
        expr = F.when(b < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("bucket", b).withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_streams: int | None = None,
    n_docs: int | None = None,
    target_docs_per_stream: int = 100_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training
    layout): documents are laid out on ``n_streams`` independent
    token streams (md5-bucketed, deterministic), each stream is a
    running concatenation in ``id_col`` order, and every
    ``max_tokens`` tokens starts a new training sequence.

    Returns a PROJECTION to (id_col, tokens_col, ``stream``
    (0..n_streams-1), ``stream_offset`` (first token position of this
    doc in its stream), ``seq_id`` (global sequence the doc STARTS in
    = stream * ceil-capacity + offset div max_tokens), ``seq_offset``
    (position within that sequence)) — other input columns are
    dropped; re-join on ``id_col`` to carry them.
    Documents longer than ``max_tokens`` simply span sequences, as in
    the real layout.

    Scale shape: one exchange on ``stream``, a running-sum window
    inside each stream, all arithmetic exact integers. No global
    sort, no single-partition window, engine-replayable (DuckDB twin
    is the same window sum). ``n_streams`` defaults to
    ``max(100, ceil(n_docs / target_docs_per_stream))`` so each
    window partition holds ~``target_docs_per_stream`` docs at ANY
    corpus size (10^9 docs -> 10 000 streams), instead of 1% of the
    corpus sorting inside each of 100 windows. Deriving it needs the
    corpus size — pass ``n_docs`` (or ``n_streams`` directly, as the
    oracle twin does to pin ``% 100``) to skip the one count job,
    mirroring the LSH auto-width pattern (similarity.py)."""
    if n_streams is None:
        if n_docs is None:
            n_docs = df.count()
        n_streams = max(100, -(-n_docs // target_docs_per_stream))
    # hash straight into [0, n_streams) — NOT split_bucket % n_streams:
    # split_bucket is already mod 100, which would leave every stream
    # >= 100 empty. For n_streams=100 this is bit-identical to
    # split_bucket (same md5 prefix), which is what the DuckDB twin pins.
    stream = md5_bucket(F.col(id_col), n_streams)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("stream", stream)
        .withColumn(
            "stream_offset",
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long"),
        )
    )
    # stream-local sequence ordinal -> globally unique, stable seq id
    # (streams are independent; 2^40 sequences per stream headroom)
    seq_in_stream = F.floor(F.col("stream_offset") / max_tokens).cast("long")
    return out.select(
        id_col,
        tokens_col,
        "stream",
        "stream_offset",
        (F.col("stream") * F.lit(1 << 40) + seq_in_stream).alias("seq_id"),
        F.pmod(F.col("stream_offset"), F.lit(max_tokens)).cast("long").alias("seq_offset"),
    )


def source_quota(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    max_per_key: int = 100,
) -> DataFrame:
    """Per-source document cap — the domain-balancing step of a crawl
    pipeline (no single host may dominate the training mix). Keeps a
    DETERMINISTIC pseudo-random ``max_per_key`` docs per key: rank by
    (md5-bucket of the id, id) inside each key, keep the first
    ``max_per_key``. Engine-replayable (same md5-prefix ordering the
    split bucket uses), order- and partitioning-independent.

    Scale shape: the rank runs through the skew-safe salted two-phase
    top-k (similarity.salted_topk_per_key) — a hot domain with 10⁸
    docs never lands its full group in one window partition; each
    salt sees ~1/32 of the key and the final rank sees at most
    32·max_per_key survivors per key. Returns (key_col, id_col)."""
    from bubbles.operators.similarity import salted_topk_per_key

    h = md5_long(F.col(id_col)).alias("__h")
    ranked = df.select(F.col(key_col), F.col(id_col), h)
    kept = salted_topk_per_key(
        ranked, key_col, [F.col("__h"), F.col(id_col)], max_per_key
    )
    return kept.select(key_col, id_col)


def weighted_mixture(
    df: DataFrame,
    weights: dict,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic corpus mixing: keep each key's rows with its
    configured probability (``weights[key]`` in [0, 1]) — the
    source-reweighting step a pre-training mix is tuned with
    (oversampled wiki, downsampled crawl...). Selection hashes
    (id, seed), NOT a random draw: the same doc is kept or dropped
    identically on every run, engine, and partitioning, and changing
    ``seed`` redraws the whole mixture. Keys absent from ``weights``
    fall back to ``default_weight`` (0 = drop — an explicit mix is a
    whitelist). Pure projection + filter: zero shuffles at any scale,
    and the filter sits directly above the scan.

    Rational thresholds: a weight w is applied as
    ``md5_bucket_1e6(id, seed) < round(w * 1e6)`` — exact integer
    comparison, so both engines agree on every row."""
    for k, w in weights.items():
        if not (0.0 <= float(w) <= 1.0):
            raise ValueError(f"weight for {k!r} must be in [0, 1], got {w}")
    if not (0.0 <= float(default_weight) <= 1.0):
        raise ValueError("default_weight must be in [0, 1]")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    thr = F.lit(int(round(float(default_weight) * 1_000_000)))
    for k, w in sorted(weights.items()):
        thr = F.when(F.col(key_col) == k, F.lit(int(round(float(w) * 1_000_000)))).otherwise(thr)
    return df.filter(bucket < thr)


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cuts: tuple = (80, 90),
    names: tuple = ("train", "val", "test"),
    groups: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup-group-granular split: each document is bucketed by its
    near-duplicate group's CANONICAL id, so near-duplicates can never
    straddle train and test — the contamination a per-document split
    (``assign_split``) cannot prevent (a benchmark answer paraphrased
    in train leaks into eval). ``groups``: optional precomputed
    (id_col, canonical_id) relation (e.g. a persisted dedup pass);
    defaults to ``near_dup_groups`` — MinHash-LSH pairs, distributed
    connected components, min-id canonical.

    Scale shape: the grouping is the dedup pass the corpus runs
    anyway; on top of it the split is the same zero-shuffle md5
    projection as ``assign_split``, just keyed by canonical_id.
    Output: (id_col, canonical_id, bucket, split)."""
    if groups is None:
        from bubbles.operators.dedup import near_dup_groups

        groups = near_dup_groups(df, text_col, id_col, **lsh_kwargs)
    return assign_split(groups, id_col="canonical_id", cuts=cuts, names=names)


def curriculum_buckets(
    df: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 1024,
) -> DataFrame:
    """Quality-curriculum assignment WITHOUT a global sort: documents
    are scored with the exact-integer quality heuristic
    (operators.text.quality_micros), per-quantile thresholds come
    from the deterministic hash-rank bottom-k sample
    (operators.sketch.sampled_quantiles — engine-replayable, exact
    for corpora <= k), and ``bucket`` = how many thresholds the score
    meets (0 = lowest-quality decile .. n_buckets-1 = highest). A
    curriculum schedule then feeds buckets in order.

    Scale shape: ntile() would be a single-partition global-sort
    window — a scale-killer at 10^9 docs. Here the thresholds reduce
    to ONE broadcast row (array of n_buckets-1 longs) and the
    assignment is a pure projection over the scan: one salted
    bottom-k aggregation + zero wide shuffles at any corpus size.
    Output: (id_col, quality_micros, bucket)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from bubbles.operators.sketch import sampled_quantiles
    from bubbles.operators.text import quality_micros

    scored = df.select(
        F.col(id_col), quality_micros(F.col(text_col)).alias("quality_micros")
    )
    qs = [i * 1_000_000 // n_buckets for i in range(1, n_buckets)]
    thr = sampled_quantiles(
        scored.withColumn("__g", F.lit(0)),
        "__g",
        id_col,
        "quality_micros",
        qs_ppm=qs,
        k=k,
    )
    thr_arr = thr.groupBy().agg(
        F.sort_array(F.collect_list("value")).alias("__thr")
    )
    return scored.crossJoin(F.broadcast(thr_arr)).select(
        id_col,
        "quality_micros",
        F.size(
            F.filter("__thr", lambda t: F.col("quality_micros") >= t)
        ).cast("long").alias("bucket"),
    )
