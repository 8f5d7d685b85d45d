"""DuckDB-side smoke test: every oracle_sql() statement must parse and
execute against the sf0.001 tables — catches SQL regressions in seconds
without spinning up Spark. Value parity against the Spark side is
tests/test_entry_parity.py (sf0.01, the driver-gate replica)."""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not pathlib.Path(SF).is_dir(), reason="testdata not available"
)

_ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_a_query():
    missing = sorted(set(_ORACLES) - set(entrymod.queries()))
    assert not missing, f"oracle_sql keys without queries() entries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_executes(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    df = con.sql(_ORACLES[name]).df()
    assert df.shape[1] >= 1  # executed and produced a relation


def test_portable_hash60_duckdb_matches_python():
    """The DuckDB leg of the portable-hash triangle (the Spark leg is
    tests/test_operators.py::test_portable_hash60_matches_python_md5):
    ('0x' || substr(md5(x), 1, 15))::BIGINT == int(md5hex[:15], 16) for
    arbitrary unicode — both hash the utf-8 bytes."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def check(s):
        got = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got == int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    check()
