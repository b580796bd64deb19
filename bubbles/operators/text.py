"""Text-analysis operators for training-data pipelines, as pure
column expressions (JVM-side, no UDFs) with exact DuckDB SQL twins
(see __spark_entry__.oracle_sql).

Net-new surface beyond the reference (north-star scope): language ID,
quality scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language heuristic.
# Chosen to be unambiguous tokens per language.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (matches DuckDB
    ``string_split_regex(lower(x), '\\s+')``)."""
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer, lookahead-free so it runs identically
# under Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, then
# leftover whitespace. The real GPT-2 pattern's trailing
# "\\s+(?!\\S)" lookahead is RE2-illegal; without it a run of spaces
# before a word folds into the word's " ?" prefix anyway, so counts
# differ only on trailing-whitespace edge cases.
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count: non-overlapping matches of the
    GPT-2-shaped pre-tokenizer regex — the budget estimator a
    pre-training pipeline uses when the real tokenizer is too
    expensive to run at scan time. JVM-side ``regexp_count``
    (no UDF); DuckDB twin: ``len(regexp_extract_all(...))``."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """All character n-grams of the lowercased text (shingles for
    Jaccard / MinHash)."""
    t = F.lower(text)
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0] — short
    # texts must produce an empty shingle list instead
    idx = F.when(
        F.length(t) >= n, F.sequence(F.lit(1), F.length(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio heuristics. All counts
    are exact integers; ratios are plain divisions (bit-identical in
    any engine)."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    toks = tokens(text)
    n_tokens = F.size(toks)
    # array_intersect already dedupes (verified both engines), so no
    # pre-distinct pass is needed
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])))
    return {
        "n_chars": n_chars,
        "n_alpha": n_alpha,
        "n_digit": n_digit,
        "n_punct": n_punct,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "alpha_ratio": n_alpha / F.greatest(n_chars, F.lit(1)),
        "avg_token_len": n_chars / F.greatest(n_tokens, F.lit(1)),
    }


def quality_micros(text: Column) -> Column:
    """Composite [0,1] quality score in exact integer micro-units:
    rewards alphabetic content, sane token lengths and stopword
    presence (LLM-pipeline heuristic, cf. Gopher/C4 quality rules).

    Everything here is integer arithmetic so the value is
    bit-identical across engines (no double rounding anywhere):
    - alpha term: round-half-up of 500000*n_alpha/nc computed as
      ``(1000000*n_alpha + nc) div (2*nc)``. The F.floor over the
      double division is exact: numerator/denominator < 2^40, and a
      non-integral quotient sits >= 1/(2*nc) away from any integer,
      far outside double ulp (~1e-10 at 1e6).
    - token-length window: ``3 <= n_chars/nt <= 12`` as the integer
      comparisons ``3*nt <= n_chars <= 12*nt``.
    """
    f = quality_features(text)
    nc = F.greatest(f["n_chars"], F.lit(1)).cast("long")
    nt = F.greatest(f["n_tokens"], F.lit(1)).cast("long")
    na = f["n_alpha"].cast("long")
    alpha_micros = F.floor((F.lit(1000000) * na + nc) / (F.lit(2) * nc)).cast("long")
    good_len = (f["n_chars"] >= 3 * nt) & (f["n_chars"] <= 12 * nt)
    has_stop = f["n_stopwords"] >= 2
    return (
        alpha_micros
        + F.when(good_len, F.lit(250000)).otherwise(F.lit(0))
        + F.when(has_stop, F.lit(250000)).otherwise(F.lit(0))
    ).cast("long")


def quality_score(text: Column) -> Column:
    """[0,1] quality score derived from the exact integer micro-units
    (`quality_micros`), so the double is the same IEEE value in every
    engine (one exact-integer / 1e6 division, no rounding)."""
    return quality_micros(text) / F.lit(1000000.0)


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax over the language lists (ties: en>de>fr —
    fixed order so the oracle matches). array_intersect dedupes, so
    the token list needs no pre-distinct pass."""
    toks = tokens(text)
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in words])))
        for lang, words in LANG_STOPWORDS.items()
    }
    en, de, fr = hits["en"], hits["de"], hits["fr"]
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Adjacent-token n-grams as space-joined strings (the unit of the
    Gopher duplicate-n-gram rule and of benchmark decontamination).
    0-indexed lambda arithmetic matches DuckDB's
    ``list_transform(range(1, len(toks) - (n-2)), i -> toks[i] || ' '
    || ... || toks[i+n-1])``."""
    toks = tokens(text)
    nt = F.size(toks)
    idx = F.when(nt >= n, F.sequence(F.lit(0), nt - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)])
    )


def word_bigrams(text: Column) -> Column:
    return word_ngrams(text, 2)


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition signals per document, as pure column
    expressions (no shuffle, no UDF):

    - ``dup_token_ratio``  — 1 − distinct/total tokens
    - ``top_token_ratio``  — most-frequent-token share of all tokens
    - ``dup_bigram_ratio`` — 1 − distinct/total adjacent bigrams

    All ratios are exact-integer divisions (bit-identical in any
    engine). The top-token count is a per-row lambda over distinct
    tokens (O(distinct·n) inside codegen — documents, not books).

    NULL-text rows are excluded (both variants): ``size(NULL)`` is -1
    in Spark, which would emit a garbage n_tokens=-1 row here while
    the exploded long variant emits no row at all — dropping them
    keeps the two variants' documented row-for-row equivalence."""
    df = df.filter(F.col(text_col).isNotNull())
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda x: x == u)),
        )
    )
    bg = word_bigrams(t)
    nb = F.size(bg)
    nbd = F.size(F.array_distinct(bg))
    denom = F.greatest(n, F.lit(1)).cast("double")
    bdenom = F.greatest(nb, F.lit(1)).cast("double")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        ((n - nd) / denom).alias("dup_token_ratio"),
        (top / denom).alias("top_token_ratio"),
        ((nb - nbd) / bdenom).alias("dup_bigram_ratio"),
    )


def repetition_profile_long(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Linear-scale twin of ``repetition_profile`` for LONG documents
    (books, transcripts): the column-expression variant's top-token
    lambda is O(distinct·n) per row — perfect inside codegen for
    web-page-sized docs, quadratic for a 500k-token book. This shape
    explodes to (doc, token) rows and takes two partial-aggregated
    shuffles (token counts, then per-doc rollup): O(n) work, fully
    distributed, identical output columns (NULL-text rows excluded in
    both variants — see ``repetition_profile``)."""
    df = df.filter(F.col(text_col).isNotNull())
    t = F.col(text_col)
    toks = df.select(F.col(id_col), F.explode(tokens(t)).alias("__tok"))
    per_tok = toks.groupBy(id_col, "__tok").agg(F.count("*").alias("__c"))
    tok_stats = per_tok.groupBy(id_col).agg(
        F.sum("__c").cast("int").alias("n_tokens"),
        F.count("*").cast("int").alias("n_distinct_tokens"),
        F.max("__c").alias("__top"),
    )
    bgs = df.select(F.col(id_col), F.explode(word_bigrams(t)).alias("__bg"))
    bg_stats = bgs.groupBy(id_col).agg(
        F.count("*").alias("__nb"),
        F.count_distinct("__bg").alias("__nbd"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    bdenom = F.greatest(F.col("__nb"), F.lit(1)).cast("double")
    return (
        tok_stats.join(bg_stats, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_distinct_tokens",
            ((F.col("n_tokens") - F.col("n_distinct_tokens")) / denom).alias(
                "dup_token_ratio"
            ),
            (F.col("__top") / denom).alias("top_token_ratio"),
            (
                (F.coalesce("__nb", F.lit(0)) - F.coalesce("__nbd", F.lit(0)))
                / bdenom
            ).alias("dup_bigram_ratio"),
        )
    )


# dialect-portable PII patterns (same semantics in Java regex and
# DuckDB's RE2): keep to character classes, bounded quantifiers, \b
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()-]{6,}[0-9]",
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask emails / IPv4s / international-format phones with typed
    placeholders and count the matches per kind — the pre-training
    scrub pass. Pure ``regexp_replace`` / ``regexp_count`` column
    expressions (JVM-side; the patterns are RE2-compatible so the
    DuckDB twin replays them verbatim).

    Each kind is COUNTED on the text after the previous kinds'
    replacements — the same text its own replacement runs on — so
    n_<kind> always equals the number of <KIND> placeholders inserted.
    (Counting on the original text overcounted when patterns overlap:
    an IPv4 inside an already-masked email domain was counted but
    never produced a placeholder.)"""
    scrubbed = F.col(text_col)
    counts = {}
    for kind, pat in PII_PATTERNS.items():
        counts[kind] = F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return df.select(
        F.col(id_col),
        *[v.cast("long").alias(f"n_{k}") for k, v in counts.items()],
        scrubbed.alias("text_scrubbed"),
    )


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over token CONTENT:
    fold(acc = (acc*1000003 + uint32(md5(token))) mod (2^31 - 1)).
    Deterministic and SQL-expressible (DuckDB list_reduce with the
    same md5-prefix integer). The folded value is the token's md5
    prefix, not its length — a length-only fold (the round-6 version)
    collided any two texts with the same token-length sequence
    ('the cat ran' == 'his dog sat'), useless as a document identity."""
    tok_h = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(  # noqa: E731
        "long"
    )
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1000003 + tok_h(t)) % F.lit(2147483647).cast("long"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """MOSS-style winnowing document fingerprints (Schleimer et al.,
    SIGMOD'03): hash every character ``k``-gram (rolling window), then
    keep the minimum hash of every window of ``w`` consecutive gram
    hashes and distinct the selections. Any shared substring of length
    >= ``k + w - 1`` between two documents is guaranteed to contribute
    at least one common fingerprint — the plagiarism/boilerplate
    detector that complements MinHash (which is order-insensitive).

    Shape: the gram-hash array is built ONCE per row (one md5 per
    gram, no UDF), posexploded to (doc, pos, hash) rows, and the
    sliding minimum is a window function over the doc partition —
    O(len) hashing + two linear shuffles (window exchange by doc id,
    then the distinct). A pure-column-expression variant (window min
    as a per-row lambda over `slice`) is a trap: Catalyst inlines the
    hash-array alias into the lambda body, re-hashing the whole
    document per window — O(len^2) md5 calls (measured 190 s vs 2 s
    on 500 docs).

    Engine-portable hash: first 15 hex digits of md5 as a 60-bit int
    (same idiom as `operators.splits.split_bucket`), so the DuckDB
    twin replays it exactly. Short documents (< k+w-1 chars but >= k)
    still emit one fingerprint (the min over all their grams);
    documents shorter than ``k`` emit none.
    """
    from pyspark.sql import Window

    # hash-partition by doc id BEFORE the hashing projection: a few-MB
    # parquet input arrives as one split, which would run all the md5
    # work single-task; partitioning by the id also pre-satisfies the
    # window's and the distinct's required distribution, so the whole
    # operator costs exactly ONE exchange (measured 13.3 s -> ~2 s at
    # sf0.1). Width choices, all measured at sf0.1:
    # - width-less repartition(col) is AQE-coalescible, and AQE sizes
    #   by input BYTES — the slim (id, text) relation coalesces to ~1
    #   task and the per-gram md5 work serializes (9.7 s vs 1.1 s);
    # - exactly shuffle.partitions (= core count here) leaves no
    #   headroom for the explosion stage's skew/spill (210 s vs 72 s
    #   at 500k docs in SCALEBENCH);
    # - max(shuffle.partitions, 2x cores) gives ~2 tasks per core on
    #   the heavy stage — standard heavy-stage sizing — while a
    #   cluster-tuned larger shuffle.partitions still wins the max.
    # Reading confs (not df.rdd.getNumPartitions()) avoids the
    # DataFrame->RDD plan conversion minhash_lsh_pairs documents
    # avoiding (dedup.py).
    spark = df.sparkSession
    width = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        2 * spark.sparkContext.defaultParallelism,
    )
    df = df.repartition(width, F.col(id_col))
    grams = char_ngrams(F.col(text_col), k)
    h = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    # gram count from the text length — cheap, avoids a second
    # evaluation of the hash array for size()
    n = F.greatest(F.length(F.lower(F.col(text_col))) - (k - 1), F.lit(0))
    ex = df.select(
        F.col(id_col),
        n.alias("__n"),
        F.posexplode(h).alias("__i", "__h"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("__i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        ex.withColumn("__wmin", F.min("__h").over(win))
        # 0-based window starts: 0 .. max(n-w, 0)
        .filter(F.col("__i") <= F.greatest(F.col("__n") - w, F.lit(0)))
        .select(F.col(id_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-stop text-analysis projection used by the pipeline entry."""
    t = F.col(text_col)
    f = quality_features(t)
    return df.select(
        F.col(id_col),
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["n_alpha"].alias("n_alpha"),
        f["n_punct"].alias("n_punct"),
        F.round(f["alpha_ratio"], 6).alias("alpha_ratio"),
        quality_micros(t).alias("quality_micros"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_docs: int = 2,
    delim: str = "\n",
    tokens_per_segment: int | None = None,
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal at SEGMENT
    granularity: drop every segment whose exact text occurs in
    ``min_docs`` or more distinct documents (nav bars, license
    footers, cookie banners — content repeated verbatim across
    pages), then restitch each document from its surviving segments
    in original order.  Returns
    (doc_id, text_clean, n_kept, n_segs).

    Segmentation: by ``delim`` (default newline — the real-corpus
    mode), or fixed ``tokens_per_segment`` windows of the
    space-token stream when the corpus has no line structure.  Doc
    reconstruction uses the same separator, so
    ``segment_dedup(clean) == clean`` is a fixpoint.

    Every per-segment row that reaches a shuffle carries an md5
    instead of the segment text where only identity matters (the
    boilerplate-frequency agg and the anti-semantics join key), the
    frequency agg is a two-phase count(distinct doc) with map-side
    partials, and reconstruction is ONE doc-keyed aggregation whose
    projection sorts/filters/joins the bounded per-doc segment array
    (array functions evaluate once per doc — no per-element alias
    re-expansion).  A viral boilerplate line is a hot md5 key in a
    count agg: skew-safe.  No windows, no non-equi joins.
    """
    sep = " " if tokens_per_segment is not None else delim
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    if tokens_per_segment is not None:
        toks = base.select(
            "doc_id", F.posexplode(F.split("t", " ")).alias("pos", "tok")
        )
        segments = (
            toks.groupBy(
                "doc_id",
                F.expr(f"pos div {int(tokens_per_segment)}").alias("seg"),
            )
            .agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda x: x["tok"],
                    ),
                ).alias("segtext")
            )
        )
    else:
        # java regex: quote the delimiter so "\n" / "." / "|" all
        # split literally
        import re as _re

        segments = base.select(
            "doc_id",
            F.posexplode(F.split("t", _re.escape(delim))).alias(
                "seg", "segtext"
            ),
        )
    seghash = segments.withColumn("h", F.md5("segtext"))
    boiler = (
        # EMPTY segments (blank lines / trailing delimiters) are
        # structure, not boilerplate — without the length guard, two
        # docs each containing one blank line make EVERY blank line in
        # the corpus "boilerplate" and the restitch destroys paragraph
        # breaks corpus-wide
        seghash.filter(F.length("segtext") > 0)
        .groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= int(min_docs))
        .select("h", F.lit(True).alias("is_boiler"))
    )
    flagged = seghash.join(boiler, "h", "left").select(
        "doc_id",
        "seg",
        "segtext",
        F.col("is_boiler").isNull().alias("keep"),
    )
    kept_sorted = F.filter(
        F.array_sort(F.collect_list(F.struct("seg", "keep", "segtext"))),
        lambda x: x["keep"],
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            sep, F.transform(kept_sorted, lambda x: x["segtext"])
        ).alias("text_clean"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.count(F.lit(1)).alias("n_segs"),
    )


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    gram_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring removal at TOKEN-POSITION
    granularity (the "Deduplicating Training Data Makes Language
    Models Better" pass, Lee et al. 2022): every token covered by a
    ``gram_tokens``-gram whose exact text occurs ``min_count`` or more
    times across the corpus (within OR across documents) is removed,
    and each document is restitched from its surviving tokens in
    order. Unlike ``segment_dedup`` (fixed windows; a duplicated span
    straddling a window boundary survives), the sliding grams cover
    every alignment, so any duplicated run of >= gram_tokens tokens
    is removed IN FULL from all its occurrences — the
    drop-all-flagged-spans policy production pipelines use (keeping
    exactly one occurrence needs a global occurrence ordering, which
    no single-pass distributed formulation provides).

    Returns (doc_id, text_clean, n_tokens, n_kept).

    Shape: gram md5s are computed ONCE below a posexplode (one
    transform over the start sequence — O(gram_tokens) per position,
    the same hash-below-generate discipline as winnow_fingerprints,
    never re-hashed above the explode); duplicated-gram detection is
    a two-phase count on the md5 (a viral span is a hot md5 in a
    partial agg — skew-safe); coverage expands each flagged start to
    its gram_tokens positions (bounded declared fan-out, the
    active_users pattern); removal is one (doc, pos) anti-join; and
    reconstruction is ONE doc-keyed aggregation sorting the bounded
    per-doc token array. Equi-shuffles only — no windows, no
    non-equi joins, no cartesians.
    """
    if gram_tokens < 1:
        raise ValueError(f"gram_tokens must be >= 1, got {gram_tokens}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    L = int(gram_tokens)
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("arr"),
    )
    n = F.size("arr")
    gram_md5s = F.transform(
        F.sequence(F.lit(0), n - F.lit(L)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("arr"), i + 1, L))),
    )
    g = base.select(
        "doc_id",
        F.posexplode(
            F.when(n >= L, gram_md5s).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("p", "gh"),
    )
    dup = (
        g.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gh")
    )
    starts = g.join(dup, on="gh", how="left_semi")
    cov = starts.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(L - 1))).alias("pos"),
    ).distinct()
    toks = base.select("doc_id", F.posexplode("arr").alias("pos", "tok"))
    kept = toks.join(cov, on=["doc_id", "pos"], how="left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("doc_id", n.alias("n_tokens"))
        .join(reb, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """PMI-style collocation mining — the statistic behind multi-word
    vocabulary entries and tokenizer merges ("new york", "machine
    learning"): adjacent token pairs that co-occur far more often
    than their unigram frequencies predict.

    Log-free exact ranking (the keyword_search/bigram-LM discipline):
    PMI = log(c(ab)·N / (c(a)·c(b))) is monotone in the rational
    ``lift = c(ab)·N / (c(a)·c(b))``, so the score is computed as
    integer micro-units ``(1e6·c(ab)·N) div (c(a)·c(b))`` in
    DECIMAL(38,0) — bit-identical on every engine, no transcendental
    functions to disagree about. Returns the ``top_k`` pairs by
    (lift_micro desc, bigram asc) with their counts.

    Shape: ONE exploded-bigram partial-agg shuffle + one unigram
    partial-agg shuffle; the unigram relation (vocab-sized) joins the
    bigram relation twice on the word — equi-joins AQE typically
    broadcasts; the corpus total N rides a 1-row broadcast; the final
    top-k is TakeOrderedAndProject (driver-bounded, no full sort).
    ``min_count`` prunes hapax pairs BEFORE the joins — at 100 TB the
    joined relations are vocab- and surviving-pair-sized, never
    corpus-sized.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = docs.select(
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda x: x != "")
        ).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    bg = docs.select(
        F.explode(word_bigrams(F.col(text_col))).alias("ab")
    )
    bgc = (
        bg.groupBy("ab")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= min_count)
        .withColumn("wa", F.split("ab", " ")[0])
        .withColumn("wb", F.split("ab", " ")[1])
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("cw").alias("cb"))
    joined = bgc.join(ua, "wa").join(ub, "wb").crossJoin(F.broadcast(total))
    # the DIVISOR is promoted to DECIMAL too: ca*cb in BIGINT wraps
    # past 2^63 (a stopword pair at ~1.5e13 corpus tokens is ~3e23),
    # silently corrupting lift_micro exactly at the corpus scale the
    # numerator's DECIMAL(38,0) cast was added for
    lift = F.expr(
        "CAST(1000000 AS DECIMAL(38,0)) * cab * n_tokens "
        "div (CAST(ca AS DECIMAL(38,0)) * cb)"
    ).cast("long")
    return (
        joined.select(
            "ab", "cab", "ca", "cb", lift.alias("lift_micro")
        )
        .orderBy(F.desc("lift_micro"), "ab")
        .limit(top_k)
    )
