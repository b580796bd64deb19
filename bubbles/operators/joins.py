"""Skew-safe salted equi-join — the declarative fallback for joins
whose key distribution AQE can't fix.

``salted_join(fact, dim, key)``: the dim side is replicated
``n_salts`` ways (one ``explode(sequence(0, n_salts-1))`` — bounded,
declared fan-out), the fact side gets a deterministic content-hash
salt in [0, n_salts), and the join runs on (key, salt). A fact key
holding 20% of a 100 TB table lands in ONE task under a plain
hash-shuffle join; salted, it spreads across ``n_salts`` tasks at the
cost of an ``n_salts×`` copy of the (small) dim side.

When to reach for it instead of the built-ins, in order:
1. ``broadcast(dim)`` — if dim fits in memory there is no shuffle and
   no skew problem at all (what the fit loop's relabel join does).
2. AQE skew-join (``spark.sql.adaptive.skewJoin``) — splits oversized
   partitions of a sort-merge join at runtime; needs no code. This is
   the right default, and this repo leaves it on.
3. ``salted_join`` — when the skewed join must be a hash/merge join
   on a dim too big to broadcast AND the plan shape defeats AQE
   (skewed side feeding a co-partitioned downstream op, non-SMJ
   strategies, or a deterministic plan requirement). The salt is
   ``xxhash64`` of the fact row's listed columns — partitioning- and
   run-independent, so the operator stays replayable.

Result rows are EXACTLY the plain join's (pinned by the oracle twin,
which IS the plain join, and by a planted-hot-key pytest): salting is
pure physical re-balancing, never a semantic change. Null join keys
behave as in the plain equi-join (never match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON on`` with the fact side salted
    ``n_salts`` ways (see module docstring). ``salt_cols`` picks the
    fact columns hashed into the salt (default: all fact columns —
    any choice is correct, it only shapes load balance). Supports
    ``inner`` and ``left`` joins (the fact side must be preserved —
    for right/outer shapes flip the operands)."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if on not in fact.columns or on not in dim.columns:
        raise ValueError(f"join key {on!r} must exist on both sides")
    overlap = [c for c in dim.columns if c != on and c in fact.columns]
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {overlap}")

    cols = salt_cols if salt_cols is not None else list(fact.columns)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    fat = fact.withColumn("__salt", salt)
    rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fat.join(rep, on=[on, "__salt"], how=how).drop("__salt")
