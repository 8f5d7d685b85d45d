"""Failure-structure goldens — the analogue of the reference's exact
ValidatorFailure pins (test/Local/Failure.hs:20-105): failures carry
the right keyword, JSON-pointer paths, and offending value."""

from __future__ import annotations

from hjsonschema_spark.draft4 import Draft4Validator


def _fails(schema, data):
    return Draft4Validator(schema).validate(data)


def test_items_object_form_failure_paths():
    # every element validated; failing indices appear in instance_path
    fs = _fails({"items": {"type": "integer"}}, [1, "a", 2, "b"])
    assert [(f.keyword, f.instance_path) for f in fs] == [("type", "/1"), ("type", "/3")]
    assert fs[0].schema_path == "/items/type"


def test_items_array_form_positional():
    schema = {"items": [{"type": "integer"}, {"type": "string"}]}
    fs = _fails(schema, ["x", 1])
    assert [(f.keyword, f.instance_path, f.schema_path) for f in fs] == [
        ("type", "/0", "/items/0/type"),
        ("type", "/1", "/items/1/type"),
    ]
    # extra elements fall through to additionalItems
    fs2 = _fails({**schema, "additionalItems": False}, [1, "a", 99])
    assert [(f.keyword, f.instance_path) for f in fs2] == [("additionalItems", "")]
    fs3 = _fails({**schema, "additionalItems": {"type": "boolean"}}, [1, "a", 99])
    assert [(f.keyword, f.instance_path) for f in fs3] == [("type", "/2")]


def test_nested_object_property_paths():
    schema = {"properties": {"a": {"properties": {"b": {"minimum": 10}}}}}
    fs = _fails(schema, {"a": {"b": 3}})
    assert len(fs) == 1
    assert fs[0].keyword == "minimum"
    assert fs[0].instance_path == "/a/b"
    assert fs[0].schema_path == "/properties/a/properties/b/minimum"
    assert fs[0].value == "3"


def test_all_failures_collected_no_short_circuit():
    # all validators run, failures concatenated (Types.hs:20-26)
    schema = {"type": "string", "enum": ["x"], "minimum": 5}
    fs = _fails(schema, 2)
    assert {f.keyword for f in fs} == {"type", "enum", "minimum"}


def test_oneof_failure_detail():
    fs = _fails({"oneOf": [{"type": "integer"}, {"minimum": 0}]}, 3)
    assert fs[0].keyword == "oneOf" and "2 branches" in fs[0].message
    fs2 = _fails({"oneOf": [{"type": "string"}, {"type": "array"}]}, 3)
    assert fs2[0].keyword == "oneOf" and "no branch" in fs2[0].message


def test_dependency_schema_form_lateral():
    # schema-form dependency validates the WHOLE object (Object.hs:173)
    schema = {"dependencies": {"a": {"required": ["b"]}}}
    fs = _fails(schema, {"a": 1})
    assert fs[0].keyword == "required" and fs[0].schema_path == "/dependencies/a/required"
    assert _fails(schema, {"a": 1, "b": 2}) == []


def test_ref_sibling_keywords_ignored():
    # "$ref" overrides any sibling keywords (Spec.hs:129-133)
    schema = {
        "definitions": {"any": {}},
        "$ref": "#/definitions/any",
        "type": "string",  # must be IGNORED
    }
    assert Draft4Validator(schema).is_valid(123)
