"""Property-based tests (hypothesis) — the analogue of the reference's
QuickCheck round-trip law `Just a == decode (encode a)`
(test/Local.hs:87-93) for our IR, plus draft4 validator laws."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hjsonschema_spark.checks.ir import (
    AllOf,
    AnyOf,
    Bounds,
    Check,
    CheckSuite,
    Enum,
    Length,
    Not,
    OneOf,
    Pattern,
    Required,
    UniqueKey,
)
from hjsonschema_spark.draft4 import Draft4Validator

_cols = st.sampled_from(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def _leaf() -> st.SearchStrategy:
    return st.one_of(
        st.builds(Required, column=_cols),
        st.builds(Enum, column=_cols, values=st.lists(st.text(min_size=1, max_size=5), min_size=1, max_size=4, unique=True).map(tuple)),
        st.builds(Bounds, column=_cols, min=st.integers(-100, 0), max=st.integers(1, 100)),
        st.builds(Length, column=_cols, min_len=st.integers(0, 5), max_len=st.integers(6, 100)),
        st.builds(Pattern, column=_cols, regex=st.sampled_from(["^a", "b$", "[0-9]+", "x|y"])),
    )


_check = st.recursive(
    _leaf(),
    lambda inner: st.one_of(
        st.builds(AllOf, checks=st.lists(inner, min_size=1, max_size=3).map(tuple)),
        st.builds(AnyOf, checks=st.lists(inner, min_size=1, max_size=3).map(tuple)),
        st.builds(OneOf, checks=st.lists(inner, min_size=1, max_size=3).map(tuple)),
        st.builds(Not, check=inner),
    ),
    max_leaves=6,
)


@given(st.lists(_check, min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_suite_json_roundtrip(checks):
    suite = CheckSuite(name="p", key_columns=("conv_id", "turn_idx"), checks=tuple(checks) + (UniqueKey(columns=("conv_id", "turn_idx")),))
    suite.validate_config()
    s2 = CheckSuite.from_json(suite.to_json())
    assert s2 == suite
    assert json.loads(s2.to_json()) == json.loads(suite.to_json())


_json_vals = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-(10**12), 10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=20),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=8), inner, max_size=5),
    ),
    max_leaves=10,
)


@given(_json_vals)
@settings(max_examples=100, deadline=None)
def test_draft4_laws(v):
    # empty schema accepts everything (vacuous pass law)
    assert Draft4Validator({}).is_valid(v)
    # `not: {}` rejects everything
    assert not Draft4Validator({"not": {}}).is_valid(v)
    # enum [v] accepts v (mathematical equality is reflexive)
    assert Draft4Validator({"enum": [v]}).is_valid(v)
    # a value passes allOf[s] iff it passes s
    s = {"type": ["object", "array", "string", "number", "boolean", "null"]}
    assert Draft4Validator({"allOf": [s]}).is_valid(v) == Draft4Validator(s).is_valid(v)


@given(_json_vals)
@settings(max_examples=100, deadline=None)
def test_draft4_json_roundtrip_stability(v):
    """Validation verdict is invariant under JSON serialization of the
    instance (decimal-parse path == python-object path)."""
    from hjsonschema_spark.draft4 import loads_json

    schema = {"uniqueItems": True, "minItems": 0}
    direct = Draft4Validator(schema).is_valid(v)
    via_json = Draft4Validator(schema).is_valid(loads_json(json.dumps(v)))
    assert direct == via_json


def test_new_table_checks_round_trip_json():
    """FunctionalDependency and AggBounds survive to_json/from_json
    (kind-registry dispatch, tuple fields restored)."""
    from hjsonschema_spark.checks.ir import (
        AggBounds,
        CheckSuite,
        FunctionalDependency,
    )

    suite = CheckSuite(
        name="rt",
        key_columns=("k1", "k2"),
        checks=(
            FunctionalDependency(determinant=("a", "b"), dependent=("c",)),
            AggBounds(column="v", agg="stddev", min=None, max=1.5),
        ),
    )
    again = CheckSuite.from_json(suite.to_json())
    assert again == suite


def test_group_scope_checks_round_trip_json():
    """SequencePattern and GroupAggBounds survive to_json/from_json."""
    from hjsonschema_spark.checks.ir import (
        CheckSuite,
        GroupAggBounds,
        SequencePattern,
    )

    suite = CheckSuite(
        name="rt2",
        key_columns=("conv_id", "turn_idx"),
        checks=(
            SequencePattern(
                column="role",
                group_by=("conv_id",),
                order_by=("turn_idx", "ts"),
                regex="^(system,)?(user,assistant)+$",
                separator="|",
                max_value_len=64,
            ),
            GroupAggBounds(
                column="turn_idx", agg="count", group_by=("conv_id",), max=4096.0
            ),
        ),
    )
    suite.validate_config()
    again = CheckSuite.from_json(suite.to_json())
    assert again == suite
