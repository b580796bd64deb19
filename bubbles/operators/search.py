"""Corpus keyword search: BM25-shaped relevance ranking over the
documents table (north-star scope — the retrieval primitive a
training-data pipeline uses for targeted corpus slicing, e.g. "pull
every doc about X for decontamination review").

Scale shape (the whole point): for a FIXED query-term list the plan
is two corpus scans and zero wide shuffles —

  1. a projection computing per-doc term frequencies as per-row array
     lambdas (no explode, no (doc, term) shuffle),
  2. a single partial-aggregated global reduce to ONE row of corpus
     statistics (N, total length, per-term document frequencies),
  3. a broadcast of that one row back over the scoring projection,
  4. a driver-bounded global top-k (TakeOrderedAndProject — never a
     full sort).

At 100 TB this is embarrassingly parallel: no key skew is possible
because nothing ever groups by a key.

Determinism contract: the score uses a log-free rational idf
``(N - df + 0.5) / (df + 0.5)`` — PER TERM this orders documents
identically to the classic BM25 idf (which is its log); for
MULTI-TERM queries the summed rational idfs weight rare terms more
heavily than summed log idfs would, so rankings can differ from
textbook BM25 where a common-term tf pile-up would have outranked a
single rare-term hit. That trade is deliberate — constants k1=1.5,
b=0.75
that are exactly representable doubles, so every arithmetic step is
a correctly-rounded IEEE op on identical inputs — the DuckDB twin
reproduces the score BIT-IDENTICALLY (no rounding tolerance needed
by the value-hash gate). ``java.lang.Math.log`` vs libm ``log`` are
NOT guaranteed to agree in the last ulp, which is why the log is
avoided rather than replayed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bubbles.operators.text import tokens

K1 = 1.5  # exactly representable; standard BM25 range [1.2, 2.0]
B = 0.75  # exactly representable; the standard default

_TERM_RE = re.compile(r"^[a-z0-9_]+$")


def _check_terms(terms: list[str]) -> None:
    """Terms become column aliases (``tf_<term>``) and literals in
    the GENERATED twin SQL — restrict to identifier-safe lowercase
    tokens so neither side can be broken (or injected) by a term."""
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    bad = [t for t in terms if not _TERM_RE.match(t)]
    if bad:
        raise ValueError(
            f"terms must match [a-z0-9_]+ (lowercased single tokens): {bad}"
        )
    dupes = sorted({t for t in terms if terms.count(t) > 1})
    if dupes:
        # a repeated term would alias two tf_<term> columns on both
        # engines (ambiguous references, double-counted score)
        raise ValueError(f"duplicate terms: {dupes}")


def keyword_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` documents by summed per-term BM25-shaped score.

    Returns (id_col, dl, tf_<term>..., score) ordered by
    (score desc, id) — the tie-break keeps the limit boundary
    deterministic across engines.

    NULL-text rows are excluded: Spark's ``size(NULL)`` is -1 (legacy
    sizeOfNull), which would poison ``sum_dl``/``avgdl`` for EVERY
    document and diverge from SQL engines where ``sum()`` skips NULL.
    """
    _check_terms(terms)
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(F.col(text_col))

    # closure helper: a `lambda x, t=t:` two-arg form would be read by
    # F.filter as its (value, index) variant — the index, not the term
    def _tf(term: str):
        return (
            F.size(F.filter(toks, lambda x: x == F.lit(term)))
            .cast("long")
            .alias(f"tf_{term}")
        )

    per_doc = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t) for t in terms],
    )
    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    norm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * (F.col("dl").cast("double") / avgdl)
    )

    def contrib(t: str):
        tf = F.col(f"tf_{t}").cast("double")
        dfreq = F.col(f"df_{t}")
        idf = (F.col("n_docs") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        return idf * ((tf * F.lit(K1 + 1.0)) / (tf + norm))

    score = contrib(terms[0])
    for t in terms[1:]:
        score = score + contrib(t)
    return (
        scored.select(
            F.col(id_col),
            "dl",
            *[f"tf_{t}" for t in terms],
            score.alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(top_k)
    )


def keyword_search_sql(
    terms: list[str],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> str:
    """The DuckDB twin, generated from the same term list so the two
    sides can never drift. Identical operation tree: every +,-,*,/
    happens in the same order on the same doubles."""
    _check_terms(terms)
    tf_cols = ",\n                 ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in terms
    )
    df_cols = ",\n                 ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}"
        for t in terms
    )
    contribs = " + ".join(
        f"(((n_docs - df_{t}) + 0.5) / (df_{t} + 0.5))"
        f" * ((CAST(tf_{t} AS DOUBLE) * ({K1} + 1.0))"
        f" / (CAST(tf_{t} AS DOUBLE) + {K1} * ((1.0 - {B}) + {B}"
        f" * (CAST(dl AS DOUBLE) / (sum_dl / n_docs)))))"
        for t in terms
    )
    tf_names = ", ".join(f"tf_{t}" for t in terms)
    return f"""
        WITH per_doc AS (
          SELECT {id_col},
                 CAST(len(toks) AS BIGINT) AS dl,
                 {tf_cols}
          FROM (SELECT {id_col},
                       string_split_regex(lower({text_col}), '\\s+') AS toks
                FROM {table} WHERE {text_col} IS NOT NULL)
        ), stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) AS sum_dl,
                 {df_cols}
          FROM per_doc
        )
        SELECT {id_col}, dl, {tf_names},
               {contribs} AS score
        FROM per_doc, stats
        ORDER BY score DESC, {id_col} LIMIT {top_k}
    """


def inverted_index(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1000,
):
    """Materialized inverted index: ``(term, df, doc_id, tf)`` — per
    term, its document frequency and the top ``max_postings`` postings
    by (tf desc, doc_id asc). The persisted form of what
    ``keyword_search`` computes on the fly; at serving time a query
    term becomes one equi-lookup instead of a corpus scan.

    Scale shape: explode -> ONE partial-aggregated shuffle to (term,
    doc) term frequencies; document frequency is a second partial agg
    over the same slim rows; the posting cap runs through the
    skew-safe salted two-phase top-k (similarity.salted_topk_per_key)
    so a stopword term with 10^9 postings never sorts in one window
    partition — each salt keeps max_postings, the final rank sees
    <= 32*max_postings survivors. df is counted BEFORE the cap (the
    true document frequency, what idf needs), ties break on doc_id,
    and every stage is exact-integer, so the DuckDB twin (a plain
    window rank) is bit-identical. Tokenization = lowercase
    whitespace, matching corpus_vocab / keyword_search."""
    from pyspark.sql import functions as F

    from bubbles.operators.similarity import salted_topk_per_key
    from bubbles.operators.text import tokens

    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(tokens(F.col(text_col)), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    capped = salted_topk_per_key(
        tf, "term", [(-F.col("tf")), F.col(id_col)], max_postings
    )
    return capped.join(dfreq, on="term").select("term", "df", id_col, "tf")
