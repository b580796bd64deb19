"""Structured Streaming surface (net-new — the reference is batch
only; SURVEY.md §2.8 notes streaming is absent there).

Batch/stream parity: each streaming query has a batch twin with
identical semantics so the DuckDB oracle can check the rows (the
driver runs the batch twin; tests run the stream against the twin).

Timestamp note: the driver parquet stores TIMESTAMP(NANOS), which
Spark's parquet reader rejects; all readers here use
``spark.sql.legacy.parquet.nanosAsLong`` and convert to microseconds
(``timestamp_micros``), matching DuckDB's nano→micro truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch locally; kafka/kinesis in production). The file
    source needs a directory — glob-filter the single table file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENT_SCHEMA_NANOS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts per event type with a watermark for
    late data."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_counts_batch(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Batch twin of windowed_counts (same rows, no watermark).
    ``events.ts`` must be a timestamp column."""
    bucket = (F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60)).cast(
        "timestamp"
    )
    return events.groupBy(bucket.alias("win_start"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts", us: bool = False
) -> DataFrame:
    """Session assignment: a new session starts when the gap from the
    user's previous event exceeds ``gap_minutes`` (lag + running sum —
    standard batch sessionization; the streaming twin is
    session_window). ``us=True`` treats ts_col as integer
    microseconds (exact arithmetic, oracle-safe)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_col, "event_id")
    t = F.col(ts_col) if us else F.unix_timestamp(ts_col)
    gap_limit = gap_minutes * 60 * (1_000_000 if us else 1)
    gap = t - F.lag(t).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_limit), 1).otherwise(0)
    return (
        events.withColumn("__new", new_sess)
        .withColumn("session_seq", F.sum("__new").over(w))
        .drop("__new")
    )


def session_stats(
    events: DataFrame, gap_minutes: int = 30, ts_col: str = "ts", us: bool = False
) -> DataFrame:
    """(user_id, session_seq, n_events, sum_value) summary."""
    s = sessionize_batch(events, gap_minutes, ts_col=ts_col, us=us)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def session_counts_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session aggregation with Spark's native stateful
    session windows (``F.session_window``): a session closes when no
    event arrives for ``gap_minutes``; the watermark bounds state and
    finalizes sessions. Batch twin: ``session_stats`` (lag + running
    sum) — same groups, with the window start equal to the session's
    first event time."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_sessions_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "sessions_out"
):
    """Drive the session-window query over the parquet micro-batch.
    Complete mode + a single batch emits each session exactly once
    (session-window aggregations don't support update mode)."""
    q = (
        session_counts_stream(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def stateful_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user event count and value total carried in explicit
    state across micro-batches. The reference has no streaming at all
    (SURVEY §2.8); this is the net-new stateful surface.

    Emits one row per user per micro-batch with the updated totals.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "stateful_out"
):
    """Drive the stateful operator over the parquet micro-batch."""
    ev = read_events_stream(spark, sf_dir)
    q = (
        stateful_user_totals(ev)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_stream_to_memory(spark: SparkSession, sf_dir: str, name: str = "stream_out"):
    """Drive the streaming query synchronously to completion over the
    parquet micro-batch (local smoke path)."""
    q = (
        windowed_counts(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")
