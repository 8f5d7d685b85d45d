"""MapType DATA-key lifts (SURVEY §2.3 map forms) + nested-object
flattening + type arrays + per-branch combinator failure detail.

The reference applies required/patternProperties/additionalProperties
to INSTANCE keys (/root/reference/src/JSONSchema/Validator/Draft4/
Object/Properties.hs:88-209, Object.hs:96-106); the round-2 engine
lifted them to column NAMES only. These tests pin the data-key forms
over a MapType column, the reference's remainder rule (matched by
NEITHER properties nor patternProperties), and silent skipping of
uncompilable patterns (Properties.hs:150-155)."""

from __future__ import annotations

import json

import pytest

from hjsonschema_spark.checks import (
    AllOf,
    AnyOf,
    Bounds,
    CheckSuite,
    Length,
    MapKeysAllowed,
    MapPatternValues,
    MapRequiredKeys,
    OneOf,
    run_suite,
    suite_from_schema,
)
from hjsonschema_spark.checks.ir import ConfigInvalid

KEYS = ("id",)


def _suite(*checks) -> CheckSuite:
    return CheckSuite(name="map", key_columns=KEYS, checks=tuple(checks))


@pytest.fixture(scope="module")
def mapped(spark):
    rows = [
        (1, {"k": "5", "attr_login": "1.0"}),
        (2, {"k": "99", "attr_login": "2.0", "debug_trace": "t"}),
        (3, {"k": "7", "rogue": "x"}),
        (4, None),
        (5, {}),
    ]
    return spark.createDataFrame(rows, "id long, attrs map<string,string>")


def _viol(res) -> dict:
    return {
        (r["id"], r["check"]): r["value"] for r in res.violations.collect()
    }


def test_map_required_keys(spark, mapped):
    res = run_suite(mapped, _suite(MapRequiredKeys(column="attrs", keys=("k", "debug_trace"))))
    v = _viol(res)
    # NULL map (id=4) => vacuous pass (type-mismatch rule); the empty
    # map (id=5) misses BOTH keys; value = sorted missing keys
    assert v == {
        (1, "map_required_keys:attrs"): "debug_trace",
        (3, "map_required_keys:attrs"): "debug_trace",
        (5, "map_required_keys:attrs"): "debug_trace,k",
    }


def test_map_keys_allowed_none(spark, mapped):
    res = run_suite(
        mapped,
        _suite(
            MapKeysAllowed(
                column="attrs", keys=("k",), patterns=("^attr_", "^debug_")
            )
        ),
    )
    v = _viol(res)
    assert v == {(3, "map_keys_allowed:attrs"): "rogue"}


def test_map_keys_allowed_bad_pattern_skipped_silently(spark, mapped):
    # the uncompilable pattern matches nothing (Properties.hs:150-155);
    # attr_/debug_ keys become remainder and fail
    res = run_suite(
        mapped, _suite(MapKeysAllowed(column="attrs", keys=("k",), patterns=("(",)))
    )
    v = _viol(res)
    assert v == {
        (1, "map_keys_allowed:attrs"): "attr_login",
        (2, "map_keys_allowed:attrs"): "attr_login,debug_trace",
        (3, "map_keys_allowed:attrs"): "rogue",
    }


def test_map_keys_allowed_additional_schema(spark, mapped):
    # additionalProperties=SCHEMA (Properties.hs:199-209): remainder
    # VALUES must satisfy the predicate; id=3's rogue value 'x' fails
    # the numeric test, id=1/2's attr_ values pass it
    res = run_suite(
        mapped,
        _suite(
            MapKeysAllowed(
                column="attrs",
                keys=("k", "debug_trace"),
                additional="try_cast(x as double) is not null",
            )
        ),
    )
    v = _viol(res)
    assert v == {(3, "map_keys_allowed:attrs"): "rogue"}


def test_map_pattern_values(spark, mapped):
    res = run_suite(
        mapped,
        _suite(
            MapPatternValues(
                column="attrs",
                key_regex="^k$",
                value_predicate="cast(x as bigint) between 0 and 80",
            )
        ),
    )
    v = _viol(res)
    assert v == {(2, "map_pattern_values:attrs:^k$"): "k"}


def test_map_pattern_values_bad_regex_vacuous(spark, mapped):
    res = run_suite(
        mapped,
        _suite(
            MapPatternValues(column="attrs", key_regex="(", value_predicate="false")
        ),
    )
    assert res.violations.isEmpty()


def test_map_checks_config_validation():
    with pytest.raises(ConfigInvalid):
        MapRequiredKeys(column="attrs").validate_config()
    with pytest.raises(ConfigInvalid):
        MapKeysAllowed(column="attrs").validate_config()
    with pytest.raises(ConfigInvalid):
        MapKeysAllowed(column="attrs", keys=("k",), additional="").validate_config()
    with pytest.raises(ConfigInvalid):
        MapPatternValues(column="attrs", key_regex="^k$").validate_config()
    # round-trip through JSON (suite lineage contract)
    s = _suite(
        MapKeysAllowed(column="attrs", keys=("k",), patterns=("^a",)),
        MapPatternValues(column="attrs", key_regex="^k$", value_predicate="x > 0"),
        MapRequiredKeys(column="attrs", keys=("k",)),
    )
    assert CheckSuite.from_json(s.to_json()) == s


# --------------------------------------------------------------------------
# nested-object flattening onto StructType dotted paths (Schema.hs
# properties recursion; from_schema round-3 lift)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def structed(spark):
    rows = [
        (1, ("alice", 30)),
        (2, (None, 7)),       # name missing inside present struct
        (3, None),            # parent struct absent
        (4, ("bo", 200)),     # name too short, age out of bounds
    ]
    return spark.createDataFrame(
        rows, "id long, user struct<name:string, age:long>"
    )


def test_nested_object_flattens_to_struct_paths(spark, structed):
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "required": ["name"],
                "properties": {
                    "name": {"minLength": 3},
                    "age": {"minimum": 0, "maximum": 150},
                },
            }
        },
    }
    suite = suite_from_schema(schema, name="nested", key_columns=("id",))
    res = run_suite(structed, suite)
    got = {(r["id"], r["check"]) for r in res.violations.collect()}
    # id=2: required name fires (parent present); id=3: parent absent =>
    # nested schema never runs (reference: the subschema validates an
    # existing object only); id=4: both leaf checks fire on dotted paths
    assert got == {
        (2, "dependent_schema:user(required:user.name)"),
        (4, "length:user.name"),
        (4, "bounds:user.age"),
    }


def test_nested_two_levels_deep(spark):
    df = spark.createDataFrame(
        [(1, ((5,),)), (2, ((-3,),))],
        "id long, a struct<b:struct<c:long>>",
    )
    schema = {
        "type": "object",
        "properties": {
            "a": {"properties": {"b": {"properties": {"c": {"minimum": 0}}}}}
        },
    }
    suite = suite_from_schema(schema, name="deep", key_columns=("id",))
    res = run_suite(df, suite)
    got = {(r["id"], r["check"]) for r in res.violations.collect()}
    assert got == {(2, "bounds:a.b.c")}


def test_type_array_lifts_to_anyof(spark):
    # Any.hs:260-291: type accepts string-or-array; 1.0 IS a draft-4
    # integer (isInteger, Any.hs:338-341), 1.1 is not
    df = spark.createDataFrame([(1, 1.0), (2, 1.1)], "id long, x double")
    suite = suite_from_schema(
        {"type": "object", "properties": {"x": {"type": ["integer", "string"]}}},
        name="tarr", key_columns=("id",),
    )
    res = run_suite(df, suite)
    got = {r["id"] for r in res.violations.collect()}
    assert got == {2}
    # a string column passes outright (second family matches statically)
    dfs = spark.createDataFrame([(1, "s")], "id long, x string")
    assert run_suite(dfs, suite).violations.isEmpty()


def test_additional_properties_schema_over_columns(spark):
    """additionalProperties=SCHEMA at column scope (Properties.hs:
    199-209): undeclared columns get the subschema's checks via
    RemainderColumns expansion; declared and pattern-matched columns
    are exempt (the matched-by-neither remainder rule)."""
    df = spark.createDataFrame(
        [(1, "ok", "fine", "x"), (2, "ok", "fine", "toolongvalue")],
        "id long, declared string, metric_a string, extra string",
    )
    schema = {
        "type": "object",
        "properties": {"id": {"type": "integer"}, "declared": {}},
        "patternProperties": {"^metric_": {}},
        "additionalProperties": {"maxLength": 5},
    }
    suite = suite_from_schema(schema, name="ap", key_columns=("id",))
    res = run_suite(df, suite)
    got = {(r["id"], r["check"]) for r in res.violations.collect()}
    # only `extra` is remainder; only row 2 exceeds maxLength
    assert got == {(2, "length:extra")}


# --------------------------------------------------------------------------
# per-branch failure detail goldens (Any.hs:364-482 applicator detail)
# --------------------------------------------------------------------------


def test_combinator_branch_detail_goldens(spark):
    df = spark.createDataFrame([(1, 5.0)], "id long, x double")
    suite = _suite(
        AllOf(checks=(Bounds(column="x", min=0), Bounds(column="x", max=1), Bounds(column="x", max=2))),
        AnyOf(checks=(Bounds(column="x", max=1), AllOf(checks=(Bounds(column="x", max=2), Bounds(column="x", min=0))))),
        OneOf(checks=(Bounds(column="x", min=0), Bounds(column="x", max=10))),
    )
    res = run_suite(df, suite)
    vals = {r["check"]: r["value"] for r in res.violations.collect()}
    # allOf: indices of failing branches (Any.hs:364-377)
    all_of = next(v for k, v in vals.items() if k.startswith("all_of"))
    assert json.loads(all_of) == {"failed_branches": [1, 2]}
    # anyOf: every branch failed, each with its failed LEAF ids
    # (Any.hs:395-410 reports all branches' failures)
    any_of = next(v for k, v in vals.items() if k.startswith("any_of"))
    assert json.loads(any_of) == {
        "failure": "no_successes",
        "branch_failures": [
            {"branch": 0, "failed": ["bounds:x"]},
            {"branch": 1, "failed": ["bounds:x"]},
        ],
    }
    # oneOf: too many successes with the passing indices (Any.hs:435-482)
    one_of = next(v for k, v in vals.items() if k.startswith("one_of"))
    assert json.loads(one_of) == {
        "failure": "too_many_successes",
        "n_passed": 2,
        "passed_branches": [0, 1],
    }
