"""Structured Streaming surface (net-new — the reference is batch
only; SURVEY.md §2.8 notes streaming is absent there).

Batch/stream parity: each streaming query has a batch twin with
identical semantics so the DuckDB oracle can check the rows (the
driver runs the batch twin; tests run the stream against the twin).

Timestamp note: the driver parquet has shipped three generations of
``events.ts`` — TIMESTAMP(NANOS), TIMESTAMP_NTZ, and plain instant
TIMESTAMP(MICROS).
``read_events_batch`` / ``read_events_stream`` sniff the footer
(pyarrow, metadata-only) and normalize both to a true TIMESTAMP
``ts`` plus integer-microsecond ``ts_us`` matching DuckDB's
``epoch_us`` on naive wall times — WITHOUT touching any session
conf: the NANOS generation is read under an explicit ``ts long``
schema and the NTZ generation converts via TIMESTAMP_NTZ
arithmetic, so reading events never changes timestamp semantics for
other queries in the session (harnesses may still pin
``session.timeZone=UTC`` at construction for rendering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
EVENT_SCHEMA_NTZ = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


# naive wall time -> epoch micros WITHOUT the session timezone:
# TIMESTAMP_NTZ subtraction is pure wall-clock arithmetic, so the
# result equals DuckDB's epoch_us on the same naive value whatever
# spark.sql.session.timeZone is. (unix_micros(cast(ntz as timestamp))
# would route through the session zone and shift by its offset.)
_NTZ_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def _events_ts_kind(sf_dir: str) -> str:
    """'nanos' | 'ntz' | 'instant' — the three ``ts`` generations of
    the driver parquet. Sniffed from the parquet footer with pyarrow:
    metadata-only, no Spark job, and — unlike Spark schema inference —
    needs no session conf (Spark refuses to even INFER a NANOS column
    without ``spark.sql.legacy.parquet.nanosAsLong``). A tz-annotated
    footer (isAdjustedToUTC) is the plain instant TIMESTAMP
    generation — reading it as TIMESTAMP_NTZ is a parquet conversion
    error, so the stream reader must pick a different schema for it."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    if pt.is_timestamp(t) and t.unit == "ns":
        return "nanos"
    if pt.is_timestamp(t) and t.tz is not None:
        return "instant"
    return "ntz"


def _events_ts_is_nanos(sf_dir: str) -> bool:
    return _events_ts_kind(sf_dir) == "nanos"


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of the events table with ``ts`` normalized to a true
    TIMESTAMP and ``ts_us`` as integer epoch microseconds, for either
    generation of the driver parquet.

    Conf-free by construction (no session-global side effects — a
    reader that flips ``session.timeZone``/``nanosAsLong`` silently
    changes timestamp semantics for every later query in the session):
    the NANOS generation is read under an EXPLICIT ``ts long`` schema
    (legal without the ``nanosAsLong`` conf — only footer inference
    needs it, and the footer is sniffed via pyarrow), and the NTZ
    generation converts wall time to epoch micros with TIMESTAMP_NTZ
    arithmetic, which the session timezone cannot touch."""
    if _events_ts_is_nanos(sf_dir):
        ev = spark.read.schema(EVENT_SCHEMA_NANOS).parquet(f"{sf_dir}/events.parquet")
        ev = ev.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(ev.dtypes)["ts"] == "timestamp_ntz":
            ev = ev.withColumn("ts_us", F.expr(_NTZ_EPOCH_US))
        else:
            ev = ev.withColumn("ts_us", F.unix_micros(F.col("ts")))
    return ev.withColumn("ts", F.timestamp_micros("ts_us"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch locally; kafka/kinesis in production). The file
    source needs a directory — glob-filter the single table file.
    The file-source schema must be declared up front, so sniff the
    footer (pyarrow, metadata-only) to pick the right one. Conf-free,
    like read_events_batch: explicit schemas + NTZ arithmetic."""
    kind = _events_ts_kind(sf_dir)
    schema = {
        "nanos": EVENT_SCHEMA_NANOS,
        "ntz": EVENT_SCHEMA_NTZ,
        # plain instant TIMESTAMP generation (batch reader's third
        # branch): declare it as-is — an NTZ schema over an
        # isAdjustedToUTC column is a parquet conversion error
        "instant": EVENT_SCHEMA_NANOS.replace("ts long", "ts timestamp"),
    }[kind]
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if kind == "nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if kind == "instant":
        return raw.withColumn("ts", F.timestamp_micros(F.unix_micros("ts")))
    return raw.withColumn("ts", F.timestamp_micros(F.expr(_NTZ_EPOCH_US)))


def _drive_to_memory(spark, stream_df, output_mode: str, name: str):
    """Shared local smoke-path driver: run the streaming query
    synchronously to completion into a memory sink. try/finally stops
    the query even when a micro-batch throws, so a failed drive never
    leaks a running query into the session."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


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
    return _drive_to_memory(
        spark,
        session_counts_stream(read_events_stream(spark, sf_dir)),
        "complete",
        name,
    )


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
    return _drive_to_memory(
        spark, stateful_user_totals(ev), "update", name
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str, name: str = "stream_out"):
    """Drive the streaming query synchronously to completion over the
    parquet micro-batch (local smoke path)."""
    return _drive_to_memory(
        spark, windowed_counts(read_events_stream(spark, sf_dir)), "complete", name
    )


def attribution_join_stream(
    events: DataFrame, minutes: int = 240, wm: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join (purchase attribution): every
    ``purchase`` joined to each of the SAME user's ``click`` events in
    the preceding ``minutes``. Both sides carry a watermark and the
    join condition is a two-sided event-time range, so Spark can
    expire click state once ``purchase_ts`` can no longer reach it —
    bounded state at any stream length (an unconstrained stream-stream
    join would buffer forever).

    Output timestamps are integer microseconds (exact arithmetic; the
    DuckDB twin uses ``epoch_us``).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", wm)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", wm)
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {minutes} MINUTES")),
        "inner",
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("c_ts").alias("c_ts_us"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


def attribution_join_batch(events: DataFrame, minutes: int = 240) -> DataFrame:
    """Batch twin of ``attribution_join_stream``: the identical
    equi-join on user_id with the time range as a post-join filter.
    Scale shape: one hash exchange per side on user_id (AQE may
    broadcast the purchase side — it is the rarer event type); no
    window functions, no cartesian."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_ts_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    lim = minutes * 60 * 1_000_000
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts_us") <= F.col("p_ts_us"))
            & (F.col("c_ts_us") >= F.col("p_ts_us") - F.lit(lim)),
            "inner",
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            "p_ts_us",
            "c_ts_us",
            (F.col("p_ts_us") - F.col("c_ts_us")).alias("lag_us"),
            F.round("purchase_value", 6).alias("purchase_value"),
        )
    )


def run_attribution_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "attr_out"
):
    """Drive the stream-stream join over the parquet micro-batch."""
    return _drive_to_memory(
        spark, attribution_join_stream(read_events_stream(spark, sf_dir)), "append", name
    )


def dedup_events_stream(events: DataFrame, within: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on the event id:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival of each
    ``event_id`` and expires its key state once the watermark passes
    ``within`` — bounded state at any stream length (the plain
    streaming ``dropDuplicates`` grows state forever). Batch twin:
    first-arrival-per-id via min struct (same rows on any input where
    duplicates land inside the window)."""
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``dedup_events_stream``: one row per event_id,
    keeping the min (ts, user_id, ...) struct — a DETERMINISTIC
    canonical choice (stable for exact duplicate rows too). The stream
    keeps the first ARRIVAL instead (dropDuplicatesWithinWatermark has
    no other option), so the two agree whenever duplicates arrive in
    ts order — which the file-replay driver guarantees — but an
    out-of-order in-window duplicate pair can legitimately keep
    different witnesses. Equality of the KEY SET is unconditional."""
    others = [c for c in events.columns if c != "event_id"]
    best = F.min(F.struct(*others)).alias("__b")
    return (
        events.groupBy("event_id")
        .agg(best)
        .select("event_id", *[F.col(f"__b.{c}").alias(c) for c in others])
    )


def run_dedup_to_memory(spark: SparkSession, sf_dir: str, name: str = "dedup_out"):
    """Drive the streaming dedup over the parquet micro-batch."""
    return _drive_to_memory(
        spark, dedup_events_stream(read_events_stream(spark, sf_dir)), "append", name
    )


def stateful_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState +
    EventTimeTimeout): per-user state carries the open session's
    (start, last_ts, n, total); an event past the gap closes the
    previous session; the WATERMARK closes idle sessions via state
    timeout — state is bounded by (active users in the gap window),
    not by stream length. This is the hand-rolled equivalent of
    ``F.session_window`` and exists to exercise the custom-stateful
    path with real event-time state expiry (the running-totals op
    uses NoTimeout); batch twin: ``session_stats`` (same groups).

    Emits one row per CLOSED session: (user_id, session_start_us,
    n_events, sum_value).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state):
        import pandas as pd

        out = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            out.append((key[0], int(start), int(n), round(float(total), 6)))
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, v in zip(pdf["ts"], pdf["value"]):
                    rows.append((int(ts.value // 1000), float(v)))
            rows.sort()
            cur = list(state.get) if state.exists else None
            late = None  # [start, last, n, total] — pre-session stragglers
            for ts_us, v in rows:
                if cur is None:
                    cur = [ts_us, ts_us, 0, 0.0]
                elif ts_us - cur[1] > gap_us:
                    out.append(
                        (key[0], int(cur[0]), int(cur[2]), round(float(cur[3]), 6))
                    )
                    cur = [ts_us, ts_us, 0, 0.0]
                elif ts_us < cur[0] - gap_us:
                    # within-watermark late events landing a full gap
                    # BEFORE the open session: the fully-sorted batch
                    # twin would have clustered them by the SAME gap
                    # rule and closed them before the open session —
                    # so gap-cluster them here too (rows is sorted, so
                    # this is the identical left-to-right clustering;
                    # emitting each as a singleton split a mutually-
                    # close pair the twin merges)
                    if late is not None and ts_us - late[1] <= gap_us:
                        late[1] = ts_us
                        late[2] += 1
                        late[3] += v
                    else:
                        if late is not None:
                            out.append(
                                (
                                    key[0],
                                    int(late[0]),
                                    int(late[2]),
                                    round(float(late[3]), 6),
                                )
                            )
                        late = [ts_us, ts_us, 1, float(v)]
                    continue
                # max/min, never plain assignment: a late event inside
                # the session span must not shrink `last` (that would
                # shorten the event-time timeout and split sessions
                # differently from the sorted batch twin); one landing
                # within the gap before `start` extends the session
                # backwards, as the sorted twin would have
                cur[0] = min(cur[0], ts_us)
                cur[1] = max(cur[1], ts_us)
                cur[2] += 1
                cur[3] += v
                # a backwards extension can bring the open session to
                # within the gap of the pending pre-session cluster —
                # the sorted batch twin clusters left-to-right, so it
                # would bridge them into ONE session; reconcile `late`
                # into `cur` the moment the bridge forms (rows is
                # sorted, so no further late-branch event can follow a
                # main-branch one and reopen the question)
                if late is not None and cur[0] - late[1] <= gap_us:
                    cur[0] = late[0]
                    cur[2] += late[2]
                    cur[3] += late[3]
                    late = None
            if late is not None:
                out.append(
                    (key[0], int(late[0]), int(late[2]), round(float(late[3]), 6))
                )
            if cur is not None:
                state.update(tuple(cur))
                # close the open session once the event-time watermark
                # passes its gap deadline
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60_000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_us", "n_events", "sum_value"]
        )

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, session_start_us long, n_events long, "
                "sum_value double"
            ),
            stateStructType="start long, last long, n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def distinct_types_stream(events: DataFrame) -> DataFrame:
    """Per-user distinct-event-type tracking on Spark 4's
    ``transformWithStateInPandas`` (the modern arbitrary-state API —
    typed state handles + TTL instead of the single-tuple
    applyInPandasWithState contract). MapState holds the set of types
    seen per user; each batch emits the user's updated
    (n_distinct_types, n_events) so the sink converges to the batch
    twin ``distinct_types_batch``. State is bounded by (users ×
    event-type vocabulary), both small by construction; a TTL would
    bound inactive users in a production feed.

    AVAILABILITY: the transformWithStateInPandas worker protocol is
    protobuf-based; ``protobuf`` is not installed in every runtime
    (not in this repo's pinned container), so this raises a clear
    ImportError up front instead of failing inside the micro-batch.
    ``stateful_sessions`` / ``stateful_user_totals`` cover the
    custom-stateful surface on the dependency-free
    applyInPandasWithState API; this operator exists so the engine's
    streaming story includes the current-generation API where its
    dependency is present (import-gated, same policy as the Pillow
    image fallback)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(its state-server protocol is protobuf-based); install "
            "protobuf or use stateful_sessions/stateful_user_totals "
            "(applyInPandasWithState, no extra dependency)"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DistinctTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.seen = handle.getMapState("seen", "t string", "one int")
            self.total = handle.getValueState("total", "n long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = self.total.get()[0] if self.total.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t in pdf["event_type"]:
                    if not self.seen.containsKey((str(t),)):
                        self.seen.updateValue((str(t),), (1,))
            self.total.update((int(n),))
            n_types = sum(1 for _ in self.seen.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_distinct_types": [int(n_types)],
                    "n_events": [int(n)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DistinctTypes(),
        outputStructType="user_id long, n_distinct_types long, n_events long",
        outputMode="Update",
        timeMode="None",
    )


def distinct_types_batch(events: DataFrame) -> DataFrame:
    """Batch twin: per-user distinct event types + event count."""
    return events.groupBy("user_id").agg(
        F.count_distinct("event_type").alias("n_distinct_types"),
        F.count("*").alias("n_events"),
    )


def run_distinct_types_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "distinct_types_out"
):
    """Drive the transformWithStateInPandas operator over the parquet
    micro-batch; single batch -> final state equals the batch twin."""
    ev = read_events_stream(spark, sf_dir)
    return _drive_to_memory(
        spark, distinct_types_stream(ev), "update", name
    )


def user_segments_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static user→segment dimension (batch-derived, md5-bucketed so
    both engines compute the identical segment). In production this
    is the profile/CRM table the stream enriches against."""
    ev = read_events_batch(spark, sf_dir)
    seg = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 4
    )
    return ev.select("user_id").distinct().withColumn("segment", seg)


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-STATIC enrichment join + rollup: each streaming event
    picks up its user's segment from a static dimension, aggregated
    per (segment, event_type). The stream-static join is stateless —
    Spark re-plans the static side per micro-batch (broadcast under
    AQE threshold), no watermark and no join state, unlike the
    stream-stream attribution join. The rollup runs in complete mode
    over a bounded (segment × type) key space."""
    return (
        events.join(dim, on="user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def run_enrich_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "enrich_out"
) -> DataFrame:
    dim = user_segments_dim(spark, sf_dir)
    return _drive_to_memory(
        spark, enrich_stream(read_events_stream(spark, sf_dir), dim), "complete", name
    )


def kmv_distinct_stream(events: DataFrame, k: int = 16) -> DataFrame:
    """Streaming KMV distinct-count sketch per event_type
    (applyInPandasWithState): state is the bottom-k 60-bit md5-prefix
    hashes of the values seen — BOUNDED AT k LONGS PER GROUP by
    construction, the defining property of sketch state (contrast:
    exact streaming distinct needs state linear in the distinct
    count). Hashes are computed JVM-side before the stateful op (the
    same conv(md5) bridge as operators/sketch.py), the pandas update
    merges sorted distinct minima, and the emitted estimate uses the
    identical integer floor-division estimator — so after the final
    micro-batch the stream result equals batch ``kmv_distinct``
    exactly (pinned by pytest and the oracle twin)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bubbles.operators.sketch import HASH_SPACE, kmv_hash

    if k < 2:
        # same guard as batch kmv_distinct: k=1 silently estimates 0
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = events.select(
        F.col("event_type"), kmv_hash(F.col("user_id")).alias("hv")
    ).filter(F.col("hv").isNotNull())

    def update(key, pdfs, state):
        import pandas as pd

        cur = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            cur.extend(int(h) for h in pdf["hv"])
        cur = sorted(set(cur))[:k]
        state.update((cur,))
        n_kept = len(cur)
        kth = cur[-1] if cur else None
        est = n_kept if n_kept < k else (k - 1) * HASH_SPACE // kth
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_kept": [n_kept],
                "kth_min": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, n_kept long, kth_min long, est_distinct long"
        ),
        stateStructType="hashes array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_kmv_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "kmv_out", k: int = 16
) -> DataFrame:
    return _drive_to_memory(
        spark, kmv_distinct_stream(read_events_stream(spark, sf_dir), k=k), "update", name
    )


def anomaly_flags_stream(events: DataFrame, min_n: int = 8, z: int = 3) -> DataFrame:
    """Stateful streaming anomaly detector: flags each event whose
    value deviates more than ``z`` standard deviations from the
    SAME USER'S PRIOR history — the classic online quality/abuse
    signal, with the whole comparison in EXACT integer arithmetic so
    the batch twin and the DuckDB oracle are bit-identical (no
    float mean/variance anywhere).

    Rule: with x the event's value in floor-milli-units and (n, s,
    ss) the count / sum / sum-of-squares of the user's prior values,

        is_anomaly  <=>  n >= min_n  AND  (n*x - s)^2 > z^2 * (n*ss - s^2)

    which is ``((x - mean)/stddev)^2 > z^2`` cleared of both
    divisions. A constant history (den = 0) flags ANY deviation —
    the exact z->inf limit. State per user is three longs; safe while
    n * max(|x_milli|)^2 < 2^63 (~9e6 events/user at |value| <= 1000;
    the relation-sized DECIMAL(38) twins have far more headroom).
    Events arriving in one micro-batch are processed in full
    (ts_us, event_id) order, so the stream equals the sorted batch
    twin ``anomaly_flags_batch``; across micro-batches the state
    carries forward and within-watermark stragglers score against
    whatever history has accumulated (documented arrival-order
    sensitivity, same convention as stateful_sessions).

    Emits one row per scored event: (user_id, event_id, n_prior,
    value_milli, is_anomaly).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    z2 = z * z

    def update(key, pdfs, state):
        import math

        import pandas as pd

        n, s, ss = state.get if state.exists else (0, 0, 0)
        n, s, ss = int(n), int(s), int(ss)
        rows = []
        for pdf in pdfs:
            for eid, ts, v in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue
                rows.append((int(ts.value // 1000), int(eid), int(math.floor(v * 1000))))
        rows.sort()
        out = []
        for _ts_us, eid, x in rows:
            flag = n >= min_n and (n * x - s) ** 2 > z2 * (n * ss - s * s)
            out.append((key[0], eid, n, x, bool(flag)))
            n, s, ss = n + 1, s + x, ss + x * x
        state.update((n, s, ss))
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "n_prior", "value_milli", "is_anomaly"],
        )

    return events.filter(F.col("value").isNotNull()).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, event_id long, n_prior long, value_milli long, "
            "is_anomaly boolean"
        ),
        stateStructType="n long, s long, ss long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_flags_batch(events: DataFrame, min_n: int = 8, z: int = 3) -> DataFrame:
    """Batch twin of ``anomaly_flags_stream``: exclusive running
    count/sum/sum-of-squares per user via one window, the identical
    integer comparison in DECIMAL(38,0) (headroom past the kernel's
    int64 — the window side never overflows first). One exchange on
    user_id; per-user window partitions are user-history-sized.

    NaN values are dropped like the stream kernel drops them (NaN
    passes isNotNull; without the guard the batch side would emit a
    row the stream never emits and shift every later n_prior)."""
    from pyspark.sql import Window

    x = F.floor(F.col("value") * 1000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        events.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("user_id", "event_id", "ts_us", x.alias("x"))
        .select(
            "user_id",
            "event_id",
            "x",
            F.coalesce(F.count("x").over(w), F.lit(0)).alias("n"),
            F.coalesce(F.sum("x").over(w), F.lit(0)).alias("s"),
            F.coalesce(F.sum(F.col("x") * F.col("x")).over(w), F.lit(0)).alias("ss"),
        )
    )
    dev = "CAST(n AS DECIMAL(38,0)) * x - s"
    den = f"{z * z} * (CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)"
    return staged.select(
        "user_id",
        "event_id",
        F.col("n").alias("n_prior"),
        F.col("x").alias("value_milli"),
        F.expr(f"n >= {min_n} AND ({dev}) * ({dev}) > {den}").alias("is_anomaly"),
    )


def run_anomaly_to_memory(
    spark: SparkSession, sf_dir: str, name: str = "anomaly_out"
) -> DataFrame:
    return _drive_to_memory(
        spark, anomaly_flags_stream(read_events_stream(spark, sf_dir)), "append", name
    )
