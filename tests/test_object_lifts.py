"""Object-keyword lifts (SURVEY §2.2-2.3): ColumnsAllowed
(additionalProperties), PatternColumns (patternProperties),
NonNullCount / MapSize (min/maxProperties), ArrayPositional
(items array form + additionalItems). Semantics mirror
/root/reference/src/JSONSchema/Validator/Draft4/Object/Properties.hs
and .../Array.hs — see each check's docstring for file:line."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hjsonschema_spark.checks import (
    ArrayPositional,
    Bounds,
    CheckSuite,
    ColumnsAllowed,
    Length,
    MapSize,
    NonNullCount,
    PatternColumns,
    run_suite,
)
from hjsonschema_spark.checks.ir import ConfigInvalid

KEYS = ("id",)


def _suite(*checks) -> CheckSuite:
    return CheckSuite(name="lift", key_columns=KEYS, checks=tuple(checks))


@pytest.fixture(scope="module")
def wide(spark):
    rows = [(1, 10.0, -1.0, "x"), (2, -5.0, 2.0, None), (3, 0.0, 0.0, "y")]
    return spark.createDataFrame(rows, "id long, metric_a double, metric_b double, other string")


def test_columns_allowed_remainder_fails(spark, wide):
    res = run_suite(wide, _suite(ColumnsAllowed(columns=("id", "other"))))
    v = {r["check"]: r for r in res.verdicts.filter("scope = 'schema'").collect()}
    assert v["columns_allowed"]["passed"] is False
    assert v["columns_allowed"]["n_violations"] == 2  # metric_a, metric_b undeclared
    assert not res.passed()  # schema failure flips passed() with zero violation rows
    assert res.summary()["n_violations"] == 0


def test_columns_allowed_patterns_cover_remainder(spark, wide):
    res = run_suite(
        wide, _suite(ColumnsAllowed(columns=("id", "other"), patterns=("^metric_",)))
    )
    v = res.verdicts.filter("scope = 'schema'").collect()
    assert len(v) == 1 and v[0]["passed"] is True
    assert res.passed()


def test_columns_allowed_bad_pattern_skipped_silently(spark, wide):
    # uncompilable pattern contributes nothing (Properties.hs:150-155);
    # the good pattern still covers the metric columns
    res = run_suite(
        wide, _suite(ColumnsAllowed(columns=("id", "other"), patterns=("(", "^metric_")))
    )
    assert res.verdicts.filter("scope = 'schema'").collect()[0]["passed"] is True


def test_pattern_columns_expand_and_flag(spark, wide):
    res = run_suite(
        wide,
        _suite(PatternColumns(name_regex="^metric_", check=Bounds(column="", min=0.0))),
    )
    got = {(r["id"], r["check"]) for r in res.violations.collect()}
    assert got == {(1, "bounds:metric_b"), (2, "bounds:metric_a")}
    # both expansions get check-scope verdict rows
    checks = {r["check"] for r in res.verdicts.filter("scope = 'check'").collect()}
    assert checks == {"bounds:metric_a", "bounds:metric_b"}


def test_pattern_columns_bad_regex_skipped_silently(spark, wide):
    res = run_suite(
        wide, _suite(PatternColumns(name_regex="(", check=Bounds(column="", min=0.0)))
    )
    assert res.violations.count() == 0
    assert res.passed()


def test_pattern_columns_template_validated():
    with pytest.raises(ConfigInvalid):
        _suite(PatternColumns(name_regex="^m", check=Bounds(column=""))).validate_config()
    with pytest.raises(ConfigInvalid, match="column"):
        # a template without a `column` field is rejected
        _suite(
            PatternColumns(name_regex="^m", check=NonNullCount(columns=("x",), min_count=1))
        ).validate_config()
    # a valid template passes suite self-validation
    _suite(
        PatternColumns(name_regex="^m", check=Length(column="", min_len=1))
    ).validate_config()


def test_non_null_count(spark, wide):
    res = run_suite(
        wide,
        _suite(NonNullCount(columns=("metric_a", "metric_b", "other"), min_count=3)),
    )
    rows = res.violations.collect()
    assert [(r["id"], r["value"]) for r in rows] == [(2, "2")]  # other is NULL => count 2
    assert rows[0]["column"] == "metric_a,metric_b,other"


def test_map_size(spark):
    rows = [(1, {"a": "1"}), (2, {"a": "1", "b": "2", "c": "3"}), (3, None)]
    df = spark.createDataFrame(rows, "id long, m map<string,string>")
    res = run_suite(df, _suite(MapSize(column="m", min_props=1, max_props=2)))
    got = [r["id"] for r in res.violations.collect()]
    assert got == [2]  # 3 entries > max; NULL map passes (vacuous, Draft4.hs:28-33)


def test_array_positional(spark):
    rows = [
        (1, [5, 3]),          # both positions pass, no remainder
        (2, [0, 3]),          # position 0 fails (x > 0)
        (3, [5]),             # missing position 1 => passes (Array.hs:162-167)
        (4, [5, 3, 2]),       # remainder element, governed by `additional`
        (5, None),            # NULL array => vacuous pass
        (6, [5, 99]),         # position 1 fails (x < 10)
    ]
    df = spark.createDataFrame(rows, "id long, arr array<int>")
    preds = ("x > 0", "x < 10")

    def ids(additional):
        res = run_suite(
            df,
            _suite(
                ArrayPositional(column="arr", element_predicates=preds, additional=additional)
            ),
        )
        return [r["id"] for r in res.violations.collect()]

    assert ids("any") == [2, 6]          # additionalItems=true (Array.hs:217)
    assert ids("none") == [2, 4, 6]      # additionalItems=false (Array.hs:218-219)
    assert ids("x % 2 = 0") == [2, 6]    # schema form: remainder 2 is even (Array.hs:220-225)
    assert ids("x % 2 = 1") == [2, 4, 6]


def test_array_positional_config():
    with pytest.raises(ConfigInvalid):
        ArrayPositional(column="a").validate_config()  # nothing to check
    ArrayPositional(column="a", additional="none").validate_config()
