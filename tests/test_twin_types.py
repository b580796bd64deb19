"""Twin-output type lint (round-7 task: prevent HUGEINT hash-reds).

Round 6 found that the driver's value-hasher is dtype-sensitive: a
DuckDB twin whose output column is HUGEINT (int128, e.g. from
``sum()`` over BIGINT) hash-mismatches a value-identical Spark
result. This lint binds EVERY oracle twin in ``all_oracle_sql()``
against empty views with the production schemas and asserts no output
column has a type a dtype-sensitive hasher can diverge on:

- HUGEINT / UHUGEINT (int128) — the verified round-6 root cause
- DECIMAL of any width (Spark emits float64/int64, never decimal)
- TIMESTAMP WITH TIME ZONE (serializes zone-dependently)

Binding (``rel.types``) needs no data, so the test is fast and runs
on schema-only views derived from the sf0.001 parquet headers.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = pathlib.Path("/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "TIMESTAMP WITH TIME ZONE")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        # LIMIT 0 view: same schema, zero rows -> binding is instant
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet') LIMIT 0"
        )
    return c


def _twin_items():
    return sorted(entry_mod.all_oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _twin_items(), ids=[n for n, _ in _twin_items()]
)
def test_twin_output_types_hashable(con, name, sql):
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in BANNED)
    ]
    assert not bad, (
        f"oracle twin {name!r} emits hasher-unsafe column types {bad}; "
        "CAST the offending expression (usually an integer sum()) to "
        "BIGINT/DOUBLE so the driver's value-hash matches Spark"
    )
