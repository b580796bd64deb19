"""Overlapping-window document chunking — the RAG-indexing /
context-length-packing step that turns a corpus of whole documents
into fixed-size retrieval or training units.

``chunk_documents``: whitespace-tokenize each document, emit one
chunk per window of ``chunk_tokens`` tokens advancing by
``stride = chunk_tokens - overlap_tokens``. Chunk starts are
``0, stride, 2·stride, …`` up to the last start whose PREVIOUS chunk
did not already reach the document's end (previous chunk covers to
``s + overlap``, so starts satisfy ``s == 0 OR s + overlap < n``) —
the standard sliding-window rule (a trailing window that would be a
pure suffix of the previous chunk's coverage is not emitted; every
token appears in ≥ 1 chunk; consecutive chunks share exactly
``overlap_tokens`` tokens except at the tail).

The whole operator is a projection + ``posexplode``: zero shuffles,
zero UDFs, linear in total token count, and the start sequence is a
closed-form integer expression (``sequence(0, greatest(n - overlap
- 1, 0), stride)``) so the DuckDB twin (generate_series + list_slice)
emits bit-identical chunks. At 100 TB this runs at scan speed and
the explode fan-out is bounded by 1/stride chunks per token.

Empty / NULL documents produce no chunks (a whitespace-only text has
no tokens). Tokens are maximal runs of non-whitespace — both engines
split on the same RE2-portable ``\\s+`` after trimming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """(id, chunk_ord, start_token, n_chunk_tokens, chunk_text) —
    one row per sliding window (see module docstring for the exact
    start rule)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens

    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    n = F.size("__toks")
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - F.lit(overlap_tokens + 1), F.lit(0)),
        F.lit(stride),
    )
    exploded = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            "__toks",
            F.posexplode(starts).alias("chunk_ord", "start_token"),
        )
    )
    chunk = F.slice(
        F.col("__toks"), F.col("start_token") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        id_col,
        F.col("chunk_ord").cast("long").alias("chunk_ord"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
