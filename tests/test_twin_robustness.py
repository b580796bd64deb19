"""Generation- and rounding-robustness for the two formerly fragile
oracle twins (CORRECTNESS_r04's only hash-red rows):

- ``events_json_k`` must hash-match across BOTH driver
  ``events.ts`` generations (TIMESTAMP(NANOS)-as-int64 vs
  TIMESTAMP(MICROS)/NTZ — see bubbles/streaming/events.py:8-14) and
  across adversarial JSON ``k`` payloads (non-integral, quoted,
  boolean, missing, int64-overflow) where Spark's string->long cast
  and DuckDB's numeric casts historically diverged.
- ``corpus_language_rollup`` / ``text_profile`` must hash-match on
  texts engineered to land on rounding half-way points of the old
  double-based quality score (the new quality_micros path is exact
  integer arithmetic end-to-end).
"""

from __future__ import annotations

import json

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # mirror of tools/check_oracle.canon (the driver's compare shape)
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_twin(spark, sf_dir, name, tables):
    got = entry_mod.all_queries()[name](spark, str(sf_dir)).toPandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = con.execute(entry_mod.all_oracle_sql()[name]).df()
    g, e = canon(got), canon(exp)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)


K_PAYLOADS = [
    json.dumps({"k": 7, "tag": "a"}),
    json.dumps({"k": 1.5}),          # non-integral: NULL on both sides
    json.dumps({"k": -3}),
    json.dumps({"k": 0.0}),          # '0.0' fails the integral regex
    json.dumps({"k": "12"}),         # quoted integer: extracted unquoted
    json.dumps({"k": "x"}),
    json.dumps({"k": True}),
    json.dumps({"tag": "nok"}),      # missing key
    json.dumps({"k": 99999999999999999999999}),  # > int64: NULL both
    None,                             # NULL props
]


def _write_events(path, nanos: bool):
    n = len(K_PAYLOADS) * 3
    base_us = 1_700_000_000_000_000
    ts_us = [base_us + i * 60_000_000 for i in range(n)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": (
                pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
                if nanos
                else pa.array(ts_us, pa.timestamp("us"))
            ),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                [["click", "view", "purchase"][i % 3] for i in range(n)]
            ),
            "value": pa.array([round(i * 0.125, 3) for i in range(n)], pa.float64()),
            "props": pa.array([K_PAYLOADS[i % len(K_PAYLOADS)] for i in range(n)]),
        }
    )
    # version=2.6 preserves TIMESTAMP(NANOS) — the legacy driver
    # generation Spark only reads via legacy.parquet.nanosAsLong
    pq.write_table(tbl, f"{path}/events.parquet", version="2.6")


# texts engineered onto the old double path's half-way points:
# 500000*n_alpha/n_chars landing on *.5 micros, avg token length
# exactly 3 and exactly 12, exactly-2 stopwords, empties
ADVERSARIAL_TEXTS = [
    "",                                # empty: nc=max(0,1)
    "a",                               # 500000 exactly
    "ab!",                             # 2/3 alpha: 333333.33 micros
    "a!!",                             # 1/3: 166666.67
    "abc de",                          # avg_tok exactly 3 (inclusive edge)
    "abcdefghijk abcdefghijkl",        # avg_tok exactly 12 (inclusive edge)
    "abcdefghijkl abcdefghijklm",      # avg_tok 13: just outside
    "the and",                         # exactly 2 distinct en stopwords
    "the the the",                     # 1 distinct stopword
    "der die something",               # de detection
    "le la aussi",                     # fr detection
    "1234 5678",                       # digits only
    "a!      b",                       # runs of whitespace
    "x" * 16,                          # nc=16: 1/16ths land on .25/.5/.75
    "ab" + "!" * 14,                   # 2/16 alpha
    "abc" + "!" * 13,                  # 3/16
    # PII + repetition shapes for the pii_scrub / repetition twins
    "mail jane.doe+x@corp.example.org or +1 (415) 555-0199 now",
    "hosts 10.0.255.7 8.8.8.8 and 999.999.999.999 edge",
    "a a a a a",                       # max repetition
    "spam spam ham spam ham",          # alternating bigrams
]


def _write_documents(path):
    n = len(ADVERSARIAL_TEXTS)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(["en", "de", "fr", "zh"][i % 4] for i in range(n)),
            "text": pa.array(ADVERSARIAL_TEXTS),
        }
    )
    pq.write_table(tbl, f"{path}/documents.parquet")


@pytest.mark.parametrize("nanos", [True, False], ids=["ts-nanos", "ts-micros"])
def test_events_json_extract_both_generations(spark, tmp_path, nanos):
    _write_events(tmp_path, nanos)
    assert_twin(spark, tmp_path, "events_json_k", ["events"])


@pytest.mark.parametrize("nanos", [True, False], ids=["ts-nanos", "ts-micros"])
def test_events_windowed_both_generations(spark, tmp_path, nanos):
    _write_events(tmp_path, nanos)
    assert_twin(spark, tmp_path, "events_windowed", ["events"])
    assert_twin(spark, tmp_path, "events_sessionize", ["events"])


def test_text_profile_adversarial_quality(spark, tmp_path):
    _write_documents(tmp_path)
    assert_twin(spark, tmp_path, "text_profile", ["documents"])
    assert_twin(spark, tmp_path, "corpus_language_rollup", ["documents"])
    assert_twin(spark, tmp_path, "langid_confusion", ["documents"])


@pytest.mark.parametrize("nanos", [True, False], ids=["ts-nanos", "ts-micros"])
def test_events_read_has_no_session_side_effects(spark, tmp_path, nanos):
    """Reading events must not mutate session confs: any other query
    yields identical results whether or not events was read first
    (the old readers pinned session.timeZone/nanosAsLong as a read
    side-effect, silently changing timestamp semantics session-wide)."""
    from bubbles.streaming.events import read_events_batch, read_events_stream

    _write_events(tmp_path, nanos)
    confs = ["spark.sql.session.timeZone", "spark.sql.legacy.parquet.nanosAsLong"]

    def snapshot():
        return {c: spark.conf.get(c, None) for c in confs}

    before = snapshot()
    n = read_events_batch(spark, str(tmp_path)).count()
    assert n > 0
    read_events_stream(spark, str(tmp_path))  # plan-time only
    assert snapshot() == before

    # and the epoch math is timezone-independent: flip the session tz,
    # re-read, values must not shift
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        a = sorted(
            r.ts_us for r in read_events_batch(spark, str(tmp_path)).select("ts_us").collect()
        )
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        b = sorted(
            r.ts_us for r in read_events_batch(spark, str(tmp_path)).select("ts_us").collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert a == b


def test_pii_and_repetition_twins_on_matching_text(spark, tmp_path):
    """The sf corpus contains no PII, so the driver oracle only proves
    the zero case — these fixtures make the regex dialects and the
    bigram/top-token arithmetic actually fire on both engines."""
    _write_documents(tmp_path)
    assert_twin(spark, tmp_path, "pii_scrub", ["documents"])
    assert_twin(spark, tmp_path, "repetition_profile", ["documents"])


@pytest.mark.parametrize("nanos", [True, False], ids=["ts-nanos", "ts-micros"])
def test_timestamp_queries_tz_independent(spark, tmp_path, nanos):
    """The whole events family must hash-match its oracles under a
    NON-UTC session timezone — no query (and no `_t` table reader)
    may depend on a session-conf UTC pin."""
    _write_events(tmp_path, nanos)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for name in ("events_json_k", "events_windowed", "events_sessionize",
                     "events_asof_join", "stream_session_windows"):
            assert_twin(spark, tmp_path, name, ["events"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
