"""Fixed-width histograms — the distribution-shape companion to
``profile_columns`` (which gives ranges/cardinalities) and
``corpus_length_quantiles`` (which gives exact percentiles): one
partial-aggregated pass that a 100 TB profiling job can afford per
column.

``histogram``: bin = ``floor(value / bin_width)`` — IEEE floor of an
IEEE division, identical on every engine, so the DuckDB twin matches
bit-for-bit with no rounding tolerance (the classic histogram
pitfalls — half-open vs closed bins, negative-value truncation — are
settled by floor's round-toward-minus-infinity on both engines).
Emits ``(bin, bin_start, n)`` for non-empty bins; NULLs are excluded
and reported by ``profile_columns`` instead.

Scale: one two-phase hash aggregation keyed on the bin — map-side
partials reduce each partition to at most #bins rows before the
shuffle, so the exchange carries the histogram, not the data. A
degenerate bin_width that maps everything to one bin is just a 1-row
aggregate, not a hot-key problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram(df: DataFrame, col: str, bin_width: float) -> DataFrame:
    """(bin, bin_start, n) — non-empty fixed-width bins of ``col``
    (see module docstring)."""
    if col not in df.columns:
        raise ValueError(f"{col!r} not in DataFrame")
    if not (bin_width > 0):
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    b = F.floor(F.col(col).cast("double") / F.lit(float(bin_width))).cast("long")
    # NaN passes isNotNull but has no bin: floor(NaN) casts to a
    # garbage long in non-ANSI Spark (0) while SQL engines NULL/error
    # — drop it on both sides (the twin filters NOT isnan too)
    return (
        df.filter(F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double")))
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin").cast("double") * F.lit(float(bin_width))).alias(
                "bin_start"
            ),
            "n",
        )
    )
