"""Fetch-to-fixpoint layer (draft4/fetch.py) — the analogue of the
reference's referencesViaHTTP/referencesViaFilesystem + fetchHTTPAndValidate
(src/JSONSchema/Fetch.hs:58-158, src/JSONSchema/Draft4.hs:60-81).

The corpus part runs the HTTP-dependent JSON-Schema-Test-Suite files
through the FETCH path with an EMPTY starting registry: every remote
document must be discovered by walking ``$ref``s and fetched through
the injected transport (filesystem_fetcher standing in for the
reference's localhost:1234 Warp static server — test/Remote.hs:53-57),
unlike test_draft4_corpus.py which pre-seeds the full registry.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from hjsonschema_spark.draft4 import (
    Draft4Validator,
    FetchFailure,
    SchemaInvalid,
    fetch_and_validate,
    fetch_refs,
    filesystem_fetcher,
    loads_json,
)
from hjsonschema_spark.draft4.metaschema import META_SCHEMA

SUITE = pathlib.Path("/root/reference/JSON-Schema-Test-Suite/tests/draft4")
REMOTES = pathlib.Path("/root/reference/JSON-Schema-Test-Suite/remotes")
REMOTE_BASE = "http://localhost:1234/"
META_URI = "http://json-schema.org/draft-04/schema"

# files whose schemas reach over HTTP — the reference runs these only
# in its Remote.hs suite (isHTTPTest); here they exercise fetch_refs
HTTP_FILES = ("refRemote.json", "ref.json", "definitions.json")


def _fetcher():
    """Transport: localhost:1234 -> remotes dir; json-schema.org
    draft-04 meta-schema served from the vendored copy (the reference
    embeds it via Data.FileEmbed — Draft4.hs metaSchemaBytes)."""
    fs = filesystem_fetcher(str(REMOTES), REMOTE_BASE)

    def fetch(uri: str) -> bytes:
        if uri.rstrip("#") == META_URI:
            return json.dumps(META_SCHEMA).encode()
        return fs(uri)

    return fetch


def _http_cases():
    if not SUITE.is_dir():
        return
    for name in HTTP_FILES:
        path = SUITE / name
        groups = loads_json(path.read_text())
        for gi, group in enumerate(groups):
            for ti, test in enumerate(group["tests"]):
                yield pytest.param(
                    group["schema"],
                    test["data"],
                    test["valid"],
                    id=f"{name}:{gi}:{ti}:{group['description'][:40]}|{test['description'][:35]}",
                )


HTTP_CASES = list(_http_cases())


@pytest.mark.skipif(not SUITE.is_dir(), reason="reference corpus not present")
@pytest.mark.parametrize("schema,data,valid", HTTP_CASES)
def test_corpus_through_fetch_path(schema, data, valid):
    docs = fetch_refs(schema, _fetcher())
    v = Draft4Validator(schema, registry=docs)
    assert v.is_valid(data) is valid


@pytest.mark.skipif(not SUITE.is_dir(), reason="reference corpus not present")
def test_corpus_fetch_discovers_remote_documents():
    """The walk must actually FETCH: refRemote's schemas reach
    documents that are not in the starting registry."""
    groups = loads_json((SUITE / "refRemote.json").read_text())
    fetched = set()
    for group in groups:
        fetched |= set(fetch_refs(group["schema"], _fetcher()))
    assert REMOTE_BASE + "integer.json" in fetched
    assert REMOTE_BASE + "subSchemas.json" in fetched
    assert REMOTE_BASE + "folder/folderInteger.json" in fetched


# ---------------------------------------------------------------------------
# unit behavior (reference Fetch.hs semantics)
# ---------------------------------------------------------------------------

def _dict_fetcher(docs: dict[str, str]):
    def fetch(uri: str) -> str:
        return docs[uri]

    return fetch


def test_fixpoint_chain():
    """A fetched document's own refs are walked (Fetch.hs:137-147
    recursion into the freshly inserted schema)."""
    remote = {
        "http://x.test/a.json": '{"$ref": "b.json"}',
        "http://x.test/b.json": '{"items": {"$ref": "c.json"}}',
        "http://x.test/c.json": '{"type": "integer"}',
    }
    docs = fetch_refs({"$ref": "http://x.test/a.json"}, _dict_fetcher(remote))
    assert set(docs) == set(remote)
    v = Draft4Validator({"$ref": "http://x.test/a.json"}, registry=docs)
    assert v.is_valid([1, 2])
    assert not v.is_valid(["s"])


def test_fragment_only_ref_never_fetches():
    """#/definitions/x is not a new document (Fetch.hs:149-153)."""
    calls = []

    def fetch(uri):
        calls.append(uri)
        return "{}"

    schema = {"definitions": {"x": {"type": "integer"}}, "$ref": "#/definitions/x"}
    assert fetch_refs(schema, fetch) == {}
    assert calls == []


def test_relative_ref_resolved_against_document_uri():
    remote = {
        "http://x.test/dir/a.json": '{"$ref": "b.json"}',
        "http://x.test/dir/b.json": '{"type": "string"}',
    }
    docs = fetch_refs(
        loads_json(remote["http://x.test/dir/a.json"]),
        _dict_fetcher(remote),
        uri="http://x.test/dir/a.json",
        registry={"http://x.test/dir/a.json": loads_json(remote["http://x.test/dir/a.json"])},
    )
    assert "http://x.test/dir/b.json" in docs


def test_id_scope_applies_to_children_not_own_ref():
    """A node's id rebases its CHILDREN's refs; its own $ref resolves
    in the inherited scope (includeSubschemas — Fetch.hs:161-178)."""
    remote = {
        "http://a.test/root.json": '{"type": "integer"}',
        "http://b.test/sub/child.json": '{"type": "string"}',
    }
    schema = {
        "id": "http://b.test/sub/base.json",
        "$ref": "http://a.test/root.json",  # siblings disabled anyway; fetch still walks it
        "properties": {"p": {"$ref": "child.json"}},
    }
    docs = fetch_refs(schema, _dict_fetcher(remote), uri="http://a.test/start.json")
    assert "http://a.test/root.json" in docs
    assert "http://b.test/sub/child.json" in docs


def test_transport_failure_is_typed():
    def fetch(uri):
        raise OSError("connection refused")

    with pytest.raises(FetchFailure) as ei:
        fetch_refs({"$ref": "http://down.test/s.json"}, fetch)
    assert ei.value.uri == "http://down.test/s.json"


def test_http_fetcher_rejects_non_http_schemes(tmp_path):
    """Round-4 ADVICE: the HTTP transport must speak only http(s) —
    an untrusted schema's `"$ref": "file:///etc/passwd"` must raise
    FetchFailure, never read the local filesystem (the reference's
    referencesViaHTTP' is HTTP-only by construction, Fetch.hs:58-76)."""
    from hjsonschema_spark.draft4.fetch import http_fetcher

    secret = tmp_path / "secret.json"
    secret.write_text('{"x": 1}')
    fetch = http_fetcher()
    for uri in (f"file://{secret}", "ftp://x.test/a.json", "data:application/json,{}"):
        with pytest.raises(FetchFailure) as ei:
            fetch(uri)
        assert ei.value.uri == uri
        assert "scheme" in ei.value.reason
    # and through the fixpoint walk: the $ref fails typed, no file read
    with pytest.raises(FetchFailure):
        fetch_refs({"$ref": f"file://{secret}"}, fetch)


def test_parse_failure_is_typed():
    with pytest.raises(FetchFailure) as ei:
        fetch_refs(
            {"$ref": "http://x.test/bad.json"},
            _dict_fetcher({"http://x.test/bad.json": "{not json"}),
        )
    assert "parse error" in ei.value.reason


def test_max_docs_bounds_runaway_graphs():
    def fetch(uri):
        n = int(uri.rsplit("/", 1)[1].split(".")[0])
        return json.dumps({"$ref": f"http://x.test/{n + 1}.json"})

    with pytest.raises(FetchFailure) as ei:
        fetch_refs({"$ref": "http://x.test/0.json"}, fetch, max_docs=5)
    assert "more than 5" in ei.value.reason


def test_seeded_registry_not_refetched():
    calls = []

    def fetch(uri):
        calls.append(uri)
        return "{}"

    seed = {"http://x.test/a.json": {"type": "integer"}}
    docs = fetch_refs({"$ref": "http://x.test/a.json"}, fetch, registry=seed)
    assert calls == []
    assert docs["http://x.test/a.json"] == {"type": "integer"}


def test_fetch_and_validate_three_failure_classes():
    """Request / schema / data failures stay distinguishable
    (Draft4.hs HTTPValidationFailure:54-58)."""
    remote = {"http://x.test/int.json": '{"type": "integer"}'}
    schema = {"items": {"$ref": "http://x.test/int.json"}}
    # data class: a list of failures (empty == valid)
    assert fetch_and_validate(schema, [1, 2], _dict_fetcher(remote)) == []
    fails = fetch_and_validate(schema, [1, "s"], _dict_fetcher(remote))
    assert fails and fails[0].keyword == "type"
    # request class
    with pytest.raises(FetchFailure):
        fetch_and_validate(schema, [1], _dict_fetcher({}))
    # schema class (meta-schema check)
    with pytest.raises(SchemaInvalid):
        fetch_and_validate({"type": 12}, 1, _dict_fetcher(remote))
