"""Emulates the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare row-count + column names + order-insensitive values
against the matching ``oracle_sql()`` in DuckDB."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    ix = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in ix) for r in rows)


ORACLES = entrymod.oracle_sql()
ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check
        return

    rel = con.sql(ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs oracle {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(duck_rows)}"
    )
    got = _rowset(spark_cols, spark_rows)
    want = _rowset(duck_cols, duck_rows)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_fits_driver_window():
    """The driver oracle-checks only the FIRST 50 registry entries; a
    larger registry silently drops the tail from coverage (round-4
    lesson). Guard the invariant here so it fails loudly instead."""
    qs = entrymod.queries()
    assert len(qs) <= 50, (
        f"queries() has {len(qs)} entries — driver checks only the first "
        "50; fold same-shaped variants instead of growing past the window"
    )
