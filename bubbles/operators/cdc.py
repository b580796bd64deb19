"""Change-data-capture merge — applying an upsert/delete change batch
onto a corpus snapshot (the MERGE INTO of an incremental crawl
pipeline: re-crawled pages replace their row, takedowns delete it,
new pages insert).

``merge_upsert(snapshot, changes)``: ``changes`` carries the snapshot
payload plus a monotone ``seq`` (change sequence number / LSN) and an
``op`` in {'upsert', 'delete'}. Per key the HIGHEST-seq change wins;
ties on seq resolve deterministically by (op, payload-hash) descending
so reprocessing a change log with duplicated entries is idempotent —
exactly-once not required of the upstream log.

Shape, and why it scales:
- winner-per-key is ONE two-phase ``max(struct(seq, op, h, payload))``
  aggregation — map-side partials absorb a hot key's re-crawl storm
  before the shuffle; deliberately NOT a row_number window (an
  unbounded per-key window sorts the hot key in one partition).
- apply is ONE equi-join: snapshot LEFT ANTI changed-keys (survivors)
  unioned with the winners' upsert payloads. The change batch is the
  small side; AQE broadcasts it under threshold, so steady-state cost
  is one scan of the snapshot + one tiny agg.
- both legs are insert-only writes of the next snapshot version — no
  in-place mutation, which is how a parquet data lake takes a merge.

Applying batch B1 then B2 equals applying B1 ∪ B2 in one merge
whenever max-seq-per-key picks the same winners (seqs globally ordered
across batches) — pinned by tests/test_cdc_chunk_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OPS = ("upsert", "delete")


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Next snapshot version = ``snapshot`` with ``changes`` applied
    (see module docstring). Payload columns = snapshot columns; the
    changes relation must carry them all plus ``seq``/``op``."""
    payload = [c for c in snapshot.columns]
    if key_col not in payload:
        raise ValueError(f"{key_col!r} not in snapshot columns {payload}")
    missing = [c for c in payload + [seq_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    # reject unrecognized ops PER ROW (raise_error inside codegen —
    # no extra pass): a winner with a typo'd op ('Upsert', 'insert')
    # would otherwise pass the left_anti removal but fail the upsert
    # filter, silently DELETING the key from the next version
    changes = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin(*OPS), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"merge_upsert: {op_col} must be one of {OPS}, got "),
                    F.col(op_col).cast("string"),
                )
            )
        ),
    )
    # deterministic winner under duplicated/equal seqs: md5 of the
    # full payload as the final tie-break (engine-portable)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in payload]))
    winner = (
        changes.groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("seq"),
                    F.col(op_col).alias("op"),
                    h.alias("h"),
                    *[F.col(c).alias(f"p_{c}") for c in payload if c != key_col],
                )
            ).alias("w")
        )
        .select(
            F.col(key_col),
            F.col("w.op").alias("__op"),
            *[F.col(f"w.p_{c}").alias(c) for c in payload if c != key_col],
        )
    )
    survivors = snapshot.join(winner.select(key_col), on=key_col, how="left_anti")
    upserts = winner.filter(F.col("__op") == "upsert").select(*payload)
    return survivors.unionByName(upserts)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """Release diff between two corpus versions — the audit companion
    to ``merge_upsert`` (what changed between snapshot v1 and v2?):
    one row per non-identical key with status ``added`` (key only in
    new), ``removed`` (only in old) or ``changed`` (present in both,
    any payload column differs).

    Both sides reduce to (key, payload-md5) projections before ONE
    full-outer equi-join on the key — content never crosses the wire,
    only 16-byte digests, so diffing two 100 TB snapshots shuffles
    2·n_keys slim rows. Payload hash = md5 of the 0x1f-joined string
    casts of the shared non-key columns (concat_ws skips NULLs on
    both engines — a NULL→''-ambiguity documented tradeoff, same as
    merge_upsert's winner hash). Columns must match between versions;
    a schema change is a different migration problem and fails fast.
    """
    payload = [c for c in old.columns if c != key_col]
    if key_col not in old.columns or key_col not in new.columns:
        raise ValueError(f"{key_col!r} must exist on both sides")
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(old.columns)} vs {sorted(new.columns)}"
        )

    def slim(df, tag):
        h = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in payload])
        )
        return df.select(F.col(key_col), h.alias(f"__h_{tag}"))

    joined = slim(old, "o").join(slim(new, "n"), on=key_col, how="full_outer")
    status = (
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") != F.col("__h_n"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(key_col, "status")
    )


def scd2_build(
    changes: DataFrame, key_col: str, seq_col: str
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 (SCD2) history from a
    change log: one output row per change, carrying its validity
    interval ``[valid_from, valid_to)`` (``valid_to`` NULL = current
    version), its 1-based ``version`` ordinal, and ``is_current``.

    ``seq_col`` is the change's effective time in any totally-ordered
    integer/date domain (epoch days, LSN, epoch micros); (key, seq)
    pairs must be unique — dedupe upstream with ``merge_upsert``'s
    winner rule if the log can repeat.

    Shape: ONE window per key ordered by seq (lead + row_number in
    the same window spec = one exchange, one sort). Dimension change
    histories are short per key (that's what makes them dimensions),
    so per-key partitions stay tiny at any corpus size; the fact
    table never enters this job."""
    from pyspark.sql import Window

    for c in (key_col, seq_col):
        if c not in changes.columns:
            raise ValueError(f"column {c!r} not in {changes.columns}")
    w = Window.partitionBy(key_col).orderBy(seq_col)
    return (
        changes.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_asof_join(
    facts: DataFrame,
    versions: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Temporal (as-of) join of a fact table against an SCD2 history
    (``scd2_build`` output): each fact row picks the dimension
    version whose ``[valid_from, valid_to)`` interval contains its
    ``ts_col``. Facts before the key's first version drop (inner
    semantics — quarantine them upstream if that matters).

    Shape: one EQUI-join on the key plus a residual interval filter —
    never a range-join blowup, because each fact row matches at most
    (versions of its key) candidates and exactly one survives. The
    version side is dimension-sized; AQE broadcasts it under
    threshold, so at 100 TB this costs one scan of the facts."""
    j = facts.join(versions, on=key_col, how="inner")
    return j.filter(
        (F.col(ts_col) >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col(ts_col) < F.col("valid_to")))
    )
