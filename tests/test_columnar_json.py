"""Columnar (VARIANT) Draft-4 JSON validation — parity with the exact
mapInPandas interpreter path (round-3 VERDICT "Next round" item 6).

The contract pinned here (draft4/columnar.py module docstring): both
paths produce the same ``_valid`` column and the same failure
(keyword, instance_path, schema_path) triples; message/value text is
path-specific and NOT compared.

Three layers:
- a hand-built battery covering every liftable keyword and the JSON
  corner cases (missing vs null, 1 vs 1.0 vs 1e3, non-object roots,
  unparseable, SQL-NULL input, unicode lengths);
- every JSON-Schema-Test-Suite draft4 group whose schema is liftable,
  run through BOTH paths and checked against the corpus verdict;
- routing: auto picks columnar (no Python worker in the plan) for
  liftable schemas and falls back to the UDF otherwise.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from hjsonschema_spark.draft4.columnar import (
    liftable,
    validate_json_column_auto,
    validate_json_column_columnar,
)
from hjsonschema_spark.draft4.udf import validate_json_column

SUITE = pathlib.Path("/root/reference/JSON-Schema-Test-Suite/tests/draft4")


def _run_both(spark, schema, docs):
    """Run both paths over ``docs`` (list of JSON strings or None);
    return [(valid_udf, valid_col, triples_udf, triples_col)] by row."""
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i int, j string"
    )
    a = {r.i: r for r in validate_json_column(df, "j", schema).collect()}
    b = {r.i: r for r in validate_json_column_columnar(df, "j", schema).collect()}

    def triples(r):
        if r._failures_json is None:
            return None
        return sorted((f.keyword, f.instance_path, f.schema_path) for f in r._failures_json)

    return [
        (a[i]._valid, b[i]._valid, triples(a[i]), triples(b[i]))
        for i in range(len(docs))
    ]


BATTERY_SCHEMA = {
    "type": "object",
    "required": ["id", "kind"],
    "properties": {
        "id": {"type": "integer", "minimum": 0},
        "kind": {"type": "string", "enum": ["a", "b", "c"]},
        "score": {"type": "number", "minimum": 0, "maximum": 1, "exclusiveMaximum": True},
        "tag": {"type": "string", "minLength": 2, "maxLength": 5, "pattern": "^[a-z]+$"},
        "flag": {"type": "boolean"},
        "note": {"type": "null"},
        "mix": {"enum": [1, "x", True, None, 2.5]},
    },
}

BATTERY_DOCS = [
    '{"id": 1, "kind": "a"}',                       # clean
    '{"id": -1, "kind": "z", "score": 1.0, "tag": "XY", "flag": 3, "note": "x"}',
    '{"kind": "a"}',                                # required: id absent
    '{"id": null, "kind": "a"}',                    # JSON null IS present (required ok, type fails)
    '{"id": 1.0, "kind": "a"}',                     # 1.0 is an integer (math equality)
    '{"id": 1.5, "kind": "a"}',
    '{"id": 1e3, "kind": "a", "score": 0.5}',       # 1e3 is an integer
    '{"id": 1, "kind": "a", "score": 1}',           # exclusiveMaximum boundary
    '{"id": 1, "kind": "a", "score": 0.999}',
    '{"id": 99999999999999999999999, "kind": "a"}',  # beyond int64: still integer
    '{"id": 1, "kind": "a", "mix": 1.0}',           # enum math equality: 1.0 == 1
    '{"id": 1, "kind": "a", "mix": 2.50}',
    '{"id": 1, "kind": "a", "mix": null}',
    '{"id": 1, "kind": "a", "mix": false}',         # false != True member
    '{"id": 1, "kind": "a", "tag": "\\u00e9\\u00e9"}',  # 2 code points: minLength ok
    '5', '"str"', 'null', 'true', '[1,2]',          # non-object roots
    '{not json',                                    # parse failure
    None,                                           # SQL NULL passthrough
    '{}',                                           # both required missing
]


def test_battery_parity(spark):
    rows = _run_both(spark, BATTERY_SCHEMA, BATTERY_DOCS)
    for i, (va, vb, ta, tb) in enumerate(rows):
        assert va == vb, f"doc {i}: _valid udf={va} columnar={vb}"
        assert ta == tb, f"doc {i}: triples udf={ta} columnar={tb}"


def test_battery_known_verdicts(spark):
    """Spot-pin the semantics (not just path agreement)."""
    rows = _run_both(spark, BATTERY_SCHEMA, BATTERY_DOCS)
    valid = [r[0] for r in rows]
    assert valid[0] is True
    assert valid[1] is False
    assert valid[2] is False    # absent required key
    assert valid[3] is False    # present-but-null: required ok, type fails
    assert valid[4] is True     # 1.0 is an integer
    assert valid[6] is True     # 1e3 is an integer
    assert valid[7] is False    # exclusiveMaximum
    assert valid[10] is True    # enum 1.0 == 1
    assert valid[15] is False and valid[19] is False  # non-object roots
    assert valid[21] is None    # SQL NULL => NULL verdict
    # present-but-null satisfies required: triple set for doc 3 is the
    # type failure only
    assert rows[3][2] == [("type", "/id", "/properties/id/type")]


def _liftable_corpus_groups():
    if not SUITE.is_dir():
        return []
    out = []
    for path in sorted(SUITE.glob("*.json")):
        for gi, group in enumerate(json.loads(path.read_text())):
            if liftable(group["schema"]):
                out.append(
                    pytest.param(group, id=f"{path.name}:{gi}:{group['description'][:50]}")
                )
    return out


CORPUS_GROUPS = _liftable_corpus_groups()


def test_corpus_has_liftable_groups():
    """Guard: liftable() regressing to reject-everything would make the
    corpus parity test vacuously green."""
    if not SUITE.is_dir():
        pytest.skip("reference corpus not present")
    assert len(CORPUS_GROUPS) >= 5


@pytest.mark.skipif(not SUITE.is_dir(), reason="reference corpus not present")
@pytest.mark.parametrize("group", CORPUS_GROUPS)
def test_corpus_liftable_parity(spark, group):
    docs = [json.dumps(t["data"]) for t in group["tests"]]
    rows = _run_both(spark, group["schema"], docs)
    for t, (va, vb, ta, tb) in zip(group["tests"], rows):
        assert va == vb == t["valid"], f"{t['description']}: udf={va} col={vb} want={t['valid']}"
        assert ta == tb, f"{t['description']}: triples udf={ta} columnar={tb}"


def test_auto_routes_columnar_no_python_worker(spark):
    df = spark.createDataFrame([(1, '{"id": 1, "kind": "a"}')], "i int, j string")
    out = validate_json_column_auto(df, "j", BATTERY_SCHEMA)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "PythonUDF" not in plan


def test_auto_falls_back_for_unliftable(spark):
    df = spark.createDataFrame([(1, "[1]")], "i int, j string")
    schema = {"items": [{"type": "integer"}]}  # tuple form: not liftable
    assert not liftable(schema)
    out = validate_json_column_auto(df, "j", schema)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert out.collect()[0]._valid is True


def test_auto_falls_back_when_registry_present(spark):
    df = spark.createDataFrame([(1, '{"id": 1, "kind": "a"}')], "i int, j string")
    out = validate_json_column_auto(
        df, "j", BATTERY_SCHEMA, registry={"http://x.test/s.json": {}}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


@pytest.mark.parametrize(
    "schema",
    [
        {"$ref": "#/definitions/x", "definitions": {"x": {}}},
        {"allOf": [{"type": "object"}]},
        {"type": "object", "patternProperties": {"^x": {}}},
        {"type": "object", "additionalProperties": False},
        {"type": "object", "properties": {"a": {"multipleOf": 2}}},
        # array shapes OUTSIDE the lifted subset
        {"items": [{"type": "integer"}]},              # tuple form
        {"type": "array", "uniqueItems": True},
        {"items": {"items": {"type": "integer"}}},     # nested arrays
        {"type": "object", "properties": {"a": {"type": "array", "uniqueItems": True}}},
        {"type": "object", "properties": {"a": {"items": {"multipleOf": 2}}}},
        # nested object beyond required-only
        {"type": "object", "properties": {"a": {"type": "object", "required": ["b"], "properties": {"b": {}}}}},
        {"type": "object", "properties": {"a": {"type": "object", "required": ["bad key"]}}},
        # dialect-specific regex syntax routes exact (round-4 ADVICE)
        {"type": "object", "properties": {"a": {"pattern": "\\d+"}}},
        {"type": "object", "properties": {"a": {"pattern": "(?P<n>x)"}}},
        {"type": "object", "properties": {"a": {"pattern": "a\\Z"}}},
        {"items": {"pattern": "\\w"}},
        # round-5 ADVICE: class-context + quantifier-brace divergences
        {"type": "object", "properties": {"a": {"pattern": "[a&&b]"}}},
        {"type": "object", "properties": {"a": {"pattern": "a{"}}},
        {"type": "object", "properties": {"a": {"pattern": "[[a]b]"}}},
        {"type": "object", "properties": {"a": {"pattern": "[]a]"}}},
        {"type": "object", "properties": {"a": {"pattern": "[^]a]"}}},
        {"type": "object", "properties": {"a": {"pattern": "a}"}}},
        {"type": "object", "properties": {"a": {"pattern": "a{,3}"}}},
        {"type": "object", "properties": {"bad key": {}}},
        {"type": "object", "properties": {"a": {"minimum": True}}},
        {"type": "object", "properties": {"a": {"exclusiveMinimum": True}}},  # no minimum
        {"type": "object", "properties": {"a": {"pattern": "("}}},  # bad regex
        {"type": "string"},
        [],
    ],
)
def test_not_liftable(schema):
    assert not liftable(schema)


def test_liftable_accepts_subset():
    assert liftable(BATTERY_SCHEMA)
    assert liftable({"type": "object"})
    assert liftable({})
    assert liftable({"required": ["a"], "properties": {"a": {}}})
    # round-4 VERDICT item 6 widenings
    assert liftable({"items": {"type": "integer"}})
    assert liftable({"type": "array", "minItems": 1, "maxItems": 3})
    assert liftable(ARRAY_BATTERY_SCHEMA)
    assert liftable(
        {"type": "object", "properties": {"a": {"type": "object", "required": ["b"]}}}
    )
    # conservative dual-dialect regex subset IS lifted
    assert liftable(
        {"type": "object", "properties": {"a": {"pattern": "^[a-z0-9_]+(?:-[0-9]{1,3})?$"}}}
    )
    assert liftable({"type": "object", "properties": {"a": {"pattern": "[a-z&]{2,4}"}}})


ARRAY_BATTERY_SCHEMA = {
    "type": "object",
    "required": ["id"],
    "properties": {
        "id": {"type": "integer"},
        "tags": {
            "type": "array",
            "items": {"type": "string", "minLength": 2, "pattern": "^[a-z-]+$"},
            "minItems": 1,
            "maxItems": 3,
        },
        "scores": {"items": {"type": "number", "minimum": 0}},
        "meta": {"type": "object", "required": ["src", "ts"]},
    },
}

ARRAY_BATTERY_DOCS = [
    '{"id": 1, "tags": ["ab", "cd-e"], "meta": {"src": "x", "ts": 0}}',   # clean
    '{"id": 1, "tags": []}',                          # minItems
    '{"id": 1, "tags": ["a", "ab", "cd", "ef"]}',     # maxItems + elem minLength
    '{"id": 1, "tags": ["ab", 3, "UP"]}',             # elem type + pattern
    '{"id": 1, "tags": "notarray"}',                  # property type
    '{"id": 1, "scores": [0.5, -1, "x"]}',            # elem minimum + type
    '{"id": 1, "scores": 7}',                         # no declared type: vacuous
    '{"id": 1, "meta": {"src": "x"}}',                # nested required
    '{"id": 1, "meta": [1]}',                         # nested type
    '{"id": 1, "meta": {}}',                          # both nested keys missing
    '[1, 2]',                                         # non-object root: only root type fails
    None,
]


def test_array_battery_parity(spark):
    rows = _run_both(spark, ARRAY_BATTERY_SCHEMA, ARRAY_BATTERY_DOCS)
    for i, (va, vb, ta, tb) in enumerate(rows):
        assert va == vb, f"doc {i}: _valid udf={va} columnar={vb}"
        assert ta == tb, f"doc {i}: triples udf={ta} columnar={tb}"


def test_array_battery_known_verdicts(spark):
    rows = _run_both(spark, ARRAY_BATTERY_SCHEMA, ARRAY_BATTERY_DOCS)
    valid = [r[0] for r in rows]
    assert valid[0] is True
    assert valid[1] is False and rows[1][2] == [("minItems", "/tags", "/properties/tags/minItems")]
    assert valid[2] is False
    assert ("maxItems", "/tags", "/properties/tags/maxItems") in rows[2][2]
    assert ("minLength", "/tags/0", "/properties/tags/items/minLength") in rows[2][2]
    assert valid[3] is False
    assert ("type", "/tags/1", "/properties/tags/items/type") in rows[3][2]
    assert ("pattern", "/tags/2", "/properties/tags/items/pattern") in rows[3][2]
    assert valid[4] is False and rows[4][2] == [("type", "/tags", "/properties/tags/type")]
    assert valid[5] is False
    assert ("minimum", "/scores/1", "/properties/scores/items/minimum") in rows[5][2]
    assert ("type", "/scores/2", "/properties/scores/items/type") in rows[5][2]
    assert valid[6] is True        # scores has no declared type: 7 passes vacuously
    assert valid[7] is False and rows[7][2] == [("required", "/meta", "/properties/meta/required")]
    assert valid[8] is False and rows[8][2] == [("type", "/meta", "/properties/meta/type")]
    assert valid[9] is False and rows[9][2] == [("required", "/meta", "/properties/meta/required")]
    assert valid[10] is False and rows[10][2] == [("type", "", "/type")]
    assert valid[11] is None


ROOT_ARRAY_SCHEMA = {
    "type": "array",
    "items": {"type": "integer", "minimum": 0},
    "minItems": 1,
    "maxItems": 4,
}

ROOT_ARRAY_DOCS = [
    '[0, 1, 2]',
    '[]',                       # minItems
    '[1, 2, 3, 4, 5]',          # maxItems
    '[1, "x", -2, 1.0]',        # elem type + minimum; 1.0 IS an integer
    '{"a": 1}',                 # root type
    '5',
    'null',
    None,
]


def test_root_array_parity(spark):
    rows = _run_both(spark, ROOT_ARRAY_SCHEMA, ROOT_ARRAY_DOCS)
    for i, (va, vb, ta, tb) in enumerate(rows):
        assert va == vb, f"doc {i}: _valid udf={va} columnar={vb}"
        assert ta == tb, f"doc {i}: triples udf={ta} columnar={tb}"
    valid = [r[0] for r in rows]
    assert valid[0] is True
    assert valid[1] is False and rows[1][2] == [("minItems", "", "/minItems")]
    assert valid[2] is False and rows[2][2] == [("maxItems", "", "/maxItems")]
    assert valid[3] is False
    assert ("type", "/1", "/items/type") in rows[3][2]
    assert ("minimum", "/2", "/items/minimum") in rows[3][2]
    assert ("type", "/3", "/items/type") not in rows[3][2]  # 1.0 is an integer
    assert valid[4] is False and valid[5] is False and valid[6] is False
    assert valid[7] is None


def test_auto_routes_dialect_specific_regex_to_udf(spark):
    """Round-4 ADVICE (medium): Python-only / Unicode-divergent regex
    syntax must NOT reach rlike — auto routes it to the exact path."""
    df = spark.createDataFrame([(1, '{"a": "x1"}')], "i int, j string")
    for pat in ("\\d+", "(?P<n>x)", "(?=x)", "a\\Z"):
        schema = {"type": "object", "properties": {"a": {"pattern": pat}}}
        assert not liftable(schema), pat
        out = validate_json_column_auto(df, "j", schema)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, pat


def test_dollar_terminator_deviation(spark):
    """Documented dialect deviation (round-5 VERDICT item 3): '$' is
    lifted although Java also matches it before a final \r\n / \r
    while Python re matches only before \n. Pin the divergence so a
    future subset change is a conscious decision: 'x\r\n' satisfies
    pattern 'x$' on the columnar path but not on the exact UDF path."""
    import json

    from hjsonschema_spark.draft4.columnar import liftable, validate_json_column_columnar
    from hjsonschema_spark.draft4.udf import validate_json_column

    schema = {"type": "object", "properties": {"a": {"pattern": "x$"}}}
    assert liftable(schema)
    docs = [(1, json.dumps({"a": "x"})), (2, json.dumps({"a": "x\r\n"}))]
    df = spark.createDataFrame(docs, "id long, doc string")
    col_rows = {r["id"]: r["_valid"] for r in validate_json_column_columnar(df, "doc", schema).collect()}
    udf_rows = {r["id"]: r["_valid"] for r in validate_json_column(df, "doc", schema).collect()}
    assert col_rows[1] is True and udf_rows[1] is True
    # THE deviation: Java '$' accepts the \r\n-terminated value
    assert col_rows[2] is True and udf_rows[2] is False
