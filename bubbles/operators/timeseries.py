"""Time-series regularization — resampling an irregular event stream
onto a fixed grid with forward fill (the hypertable/metrics-store
primitive: dashboards and feature pipelines consume regular grids,
events arrive whenever they happen).

``resample_ffill``: per key, one output row per ``step_us`` bucket
from the key's first to its last event; each row carries the value of
the key's latest event at-or-before the bucket's end — the classic
last-observation-carried-forward resample.

Shape, and why it scales:
1. last-event-per-(key, bucket) is a two-phase ``max(struct(ts, id,
   value))`` aggregation — map-side partials absorb dense buckets, no
   window over raw events;
2. the grid is an ``explode(sequence(first_bucket, last_bucket))``
   off a tiny per-key min/max aggregate — a declared fan-out bounded
   by each key's own time span (a key emits grid rows only for its
   active range, never the global range);
3. forward fill is ONE window pass per key over the GRID (already
   reduced to one row per bucket): ``last(value, ignoreNulls=True)``
   — per-key state is the key's bucket count, the same
   bounded-per-key assumption the sessionizer makes. Keys are
   independent; a hot key is one window partition of its own grid,
   not of its raw events.

Values are carried verbatim (no arithmetic), timestamps are exact
integer microsecond division — the DuckDB twin (generate_series +
ASOF JOIN, a completely different formulation) matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    step_us: int = 300_000_000,
) -> DataFrame:
    """(key, bucket, bucket_ts_us, value) — fixed-grid forward-filled
    resample (see module docstring). ``ts_col`` must be integer epoch
    microseconds."""
    if step_us < 1:
        raise ValueError(f"step_us must be >= 1, got {step_us}")
    b = F.expr(f"{ts_col} div {step_us}")
    # 1. latest event per (key, bucket): ties on ts resolve by the
    # largest (ts, value) struct — deterministic without an id column
    last_in_bucket = (
        events.select(F.col(key_col), b.alias("bucket"), F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"))
        .groupBy(key_col, "bucket")
        .agg(F.max(F.struct("__ts", "__v")).alias("w"))
        .select(key_col, "bucket", F.col("w.__v").alias("__v"))
    )
    # 2. per-key grid over the key's own active range
    span = events.groupBy(key_col).agg(
        F.min(b).alias("b0"), F.max(b).alias("b1")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket"),
    )
    # 3. one window pass over the grid (one row per bucket) per key
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_bucket, on=[key_col, "bucket"], how="left")
        .select(
            key_col,
            "bucket",
            (F.col("bucket") * F.lit(step_us)).cast("long").alias("bucket_ts_us"),
            F.last("__v", ignorenulls=True).over(w).alias(value_col),
        )
    )
