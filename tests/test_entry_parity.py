"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 AND its DuckDB oracle, compare
row-count + column names + order-insensitive values (columns sorted by
name, like the driver's value-hash)."""

from __future__ import annotations

import math
import pathlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not pathlib.Path(SF).is_dir(), reason="testdata not available"
)


def _norm(v):
    """Type-tagged normalization: the driver's value-hash serializes
    values, so int-vs-float-vs-Decimal differences mismatch there even
    when Python `==` says equal (round 1's HUGEINT-vs-BIGINT lesson).
    Tag the type class so those divergences fail HERE first."""
    import datetime
    from decimal import Decimal

    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", round(v, 9))
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    return ("s", str(v))


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    )


def _duck_rows(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLED = sorted(entrymod.oracle_sql().keys())
ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    s_cols, s_rows = _spark_rows(q(spark, SF))
    d_cols, d_rows = _duck_rows(entrymod.oracle_sql()[name])
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"check", "n_violations", "passed"}


def test_embedding_near_dup_recovers_planted_pairs(spark):
    """The driver query plants perturbed copies (vec_id+100000,
    cosine ~0.994); the LSH+exact-verify operator must recover exactly
    those 40 pairs — random dim-64 unit vectors contribute nothing at
    min_cosine=0.95."""
    df = entrymod.queries()["embedding_near_dup"](spark, SF)
    rows = df.collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(i, i + 100000) for i in range(40)}
    assert all(r["cosine_r"] >= 0.95 for r in rows)
