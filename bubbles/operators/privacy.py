"""Privacy primitives for training-data release: deterministic keyed
pseudonymization of identifier columns, and rare-value suppression
(the generalization step of k-anonymity).

``pseudonymize`` replaces identifier columns with keyed hash tokens:
``md5(salt || 0x1f || value)`` truncated to 16 hex chars. Same
(salt, value) → same token, so joins and groupBys keep working across
tables pseudonymized with the same salt (referential integrity
survives), while rotating the salt unlinks every release from the
previous one. The weakness to know: md5 here is a deterministic
keyed-lookup obfuscation, not a cryptographic MAC — an adversary who
knows the salt can dictionary-test candidate identifiers, so the salt
must be secret and high-entropy (at 100 TB the operator cost is the
same either way: a pure projection, zero shuffles). NULLs stay NULL.

``suppress_rare`` nulls out values of a quasi-identifier column that
occur fewer than ``min_count`` times — the rows survive, the rare
value (a fingerprintable singleton: an exotic user agent, a tiny
language, a one-off event type) is generalized away. Shape: one
two-phase count aggregation over the column's distinct values + one
equi-join back (the counts relation is bounded by the true
cardinality, and a hot value is one row in it — skew-irrelevant).
Suppression by threshold is exact and order-independent, so the
DuckDB twin matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pseudonymize(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Replace each column in ``cols`` with its 16-hex-char keyed
    token (see module docstring). Pure projection, zero shuffles."""
    if not cols:
        raise ValueError("pseudonymize needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not salt:
        raise ValueError("salt must be non-empty (and kept secret)")
    out = df
    for c in cols:
        tok = F.substring(
            F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(c).cast("string"))),
            1,
            16,
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def suppress_rare(
    df: DataFrame, col: str, min_count: int = 100
) -> DataFrame:
    """NULL out values of ``col`` occurring < ``min_count`` times
    (rows are kept). One count agg + one equi-join."""
    if col not in df.columns:
        raise ValueError(f"{col!r} not in DataFrame")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    frequent = (
        df.groupBy(F.col(col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__v")
    )
    joined = df.join(frequent, on=df[col] == frequent["__v"], how="left")
    return joined.withColumn(
        col, F.when(F.col("__v").isNotNull(), F.col(col))
    ).drop("__v")
