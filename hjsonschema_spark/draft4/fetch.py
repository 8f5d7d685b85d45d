"""Fetch remotely-referenced schema documents to fixpoint.

Driver-side analogue of the reference's fetch layer: walk a schema and
every embedded subschema, resolve each ``$ref`` against the current
resolution scope, fetch every referenced document that is not yet
known, parse it, and recurse into IT (fetched documents may reference
further documents) until no unseen URI remains. The resulting
``{uri: document}`` registry plugs straight into
``Draft4Validator(schema, registry=...)``.

Behavioral spec (NOT ported — the reference is Haskell):

- ``getRecursiveReferences`` — src/JSONSchema/Fetch.hs:119-158:
  fixpoint walk, fragment-only refs never fetch a document, the
  document key is the fragmentless URI, a JSON parse failure aborts.
- ``referencesViaHTTP'`` / ``referencesViaFilesystem'`` —
  src/JSONSchema/Fetch.hs:58-76, 87-101: the transport is an injected
  ``uri -> bytes`` function; transport errors surface as a typed
  failure, never as a pass.
- ``includeSubschemas`` — src/JSONSchema/Fetch.hs:161-178: children
  inherit the scope updated by their PARENT's ``id``; a node's own
  ``$ref`` resolves against the scope it inherited (its own ``id``
  does not apply to its own ``$ref``).
- embedded-subschema positions — src/JSONSchema/Draft4/Spec.hs:19-33
  (``embedded``) via the d4Spec keyword list: allOf/anyOf/oneOf
  elements, not, dependencies (schema form), items (object and array
  form), additionalItems, properties / patternProperties /
  additionalProperties, definitions.
- ``fetchHTTPAndValidate`` — src/JSONSchema/Draft4.hs:60-81 and
  test/Remote.hs:23-37: fetch to fixpoint, meta-schema-check the root
  schema, then validate the instance; the three failure classes
  (request, schema, data) stay distinguishable.

The reference's Remote.hs test serves JSON-Schema-Test-Suite/remotes
on a localhost Warp server; ``filesystem_fetcher`` is the transport
that makes the same corpus runnable with no socket (tests inject it),
while ``http_fetcher`` is the live-URI transport for real deployments
(schema configs referencing published schemas).
"""

from __future__ import annotations

import urllib.request
from typing import Any, Callable

from hjsonschema_spark.draft4.validator import (
    Draft4Validator,
    Failure,
    SchemaInvalid,
    loads_json,
)
from urllib.parse import urljoin, urlsplit

Fetcher = Callable[[str], "bytes | str"]


class FetchFailure(Exception):
    """Transport or parse failure while fetching a referenced schema
    (reference HTTPFailure / FilesystemFailure — Fetch.hs:51-54,
    84-87). ``uri`` is the document that failed."""

    def __init__(self, uri: str, reason: str):
        super().__init__(f"fetching {uri!r}: {reason}")
        self.uri = uri
        self.reason = reason


def _embedded(schema: dict) -> list[Any]:
    """Embedded subschemas of a draft-4 schema object, mirroring the
    reference's ``embedded`` positions (Draft4/Spec.hs:19-33). Order is
    irrelevant to the fixpoint; non-dict entries are skipped exactly as
    the reference's typed Schema decoding drops them."""
    out: list[Any] = []
    for kw in ("allOf", "anyOf", "oneOf"):
        v = schema.get(kw)
        if isinstance(v, list):
            out.extend(s for s in v if isinstance(s, dict))
    if isinstance(schema.get("not"), dict):
        out.append(schema["not"])
    for kw in ("properties", "patternProperties", "definitions"):
        v = schema.get(kw)
        if isinstance(v, dict):
            out.extend(s for s in v.values() if isinstance(s, dict))
    deps = schema.get("dependencies")
    if isinstance(deps, dict):
        out.extend(s for s in deps.values() if isinstance(s, dict))
    items = schema.get("items")
    if isinstance(items, dict):
        out.append(items)
    elif isinstance(items, list):
        out.extend(s for s in items if isinstance(s, dict))
    for kw in ("additionalItems", "additionalProperties"):
        v = schema.get(kw)
        if isinstance(v, dict):
            out.append(v)
    return out


def _doc_uri(ref: str, scope: str | None) -> str | None:
    """The fragmentless document URI a ``$ref`` fetches, or None when
    the ref is fragment-only (never a new document — Fetch.hs:149-153
    considers the reference BEFORE updating the scope)."""
    if not urlsplit(ref)._replace(fragment="").geturl():
        return None
    absolute = urljoin(scope, ref) if scope else ref
    return urlsplit(absolute)._replace(fragment="").geturl() or None


def fetch_refs(
    schema: Any,
    fetch: Fetcher,
    uri: str | None = None,
    registry: dict[str, Any] | None = None,
    max_docs: int = 256,
) -> dict[str, Any]:
    """Walk ``schema`` (fetched from ``uri``, if known) to fixpoint and
    return the ``{fragmentless_uri: document}`` registry of every
    transitively ``$ref``-referenced document. Documents already in
    ``registry`` are trusted and not refetched (the seeded map is the
    reference's non-empty starting URISchemaMap). ``max_docs`` bounds
    runaway reference graphs (the fixpoint itself terminates on any
    finite graph because each fetch adds one unseen URI)."""
    docs: dict[str, Any] = dict(registry or {})

    def go(node: Any, scope: str | None) -> None:
        if not isinstance(node, dict):
            return
        ref = node.get("$ref")
        if isinstance(ref, str):
            target = _doc_uri(ref, scope)
            if target is not None and target not in docs:
                if len(docs) >= max_docs:
                    raise FetchFailure(target, f"more than {max_docs} referenced documents")
                try:
                    raw = fetch(target)
                except Exception as e:  # transport failure is typed, never a pass
                    raise FetchFailure(target, str(e)) from e
                try:
                    fetched = loads_json(raw)
                except Exception as e:
                    raise FetchFailure(target, f"parse error: {e}") from e
                docs[target] = fetched
                go(fetched, target)
        # children inherit the scope updated by THIS node's id
        # (includeSubschemas — Fetch.hs:161-178)
        child_scope = scope
        sid = node.get("id")
        if isinstance(sid, str) and sid:
            child_scope = urljoin(scope, sid) if scope else sid
        for sub in _embedded(node):
            go(sub, child_scope)

    go(schema, uri)
    return docs


def http_fetcher(timeout: float = 10.0) -> Fetcher:
    """Live-URI transport (reference referencesViaHTTP' —
    Fetch.hs:58-76). Returns raw bytes; HTTP errors raise and surface
    as FetchFailure. Rejects non-http(s) URIs with FetchFailure — an
    untrusted schema's ``"$ref": "file:///etc/passwd"`` must never
    read the local filesystem through the HTTP transport (round-4
    ADVICE; the reference's transport speaks only HTTP by
    construction). Other transports are injected explicitly
    (filesystem_fetcher, or a custom Fetcher)."""

    def fetch(uri: str) -> bytes:
        scheme = urlsplit(uri).scheme.lower()
        if scheme not in ("http", "https"):
            raise FetchFailure(
                uri,
                f"scheme {scheme!r} is not fetchable over the HTTP "
                "transport; inject filesystem_fetcher or a custom "
                "Fetcher for non-http(s) references",
            )
        with urllib.request.urlopen(uri, timeout=timeout) as resp:  # noqa: S310
            return resp.read()

    return fetch


def filesystem_fetcher(root: str, base: str) -> Fetcher:
    """Map ``base``-prefixed URIs onto files under ``root`` — the
    socketless stand-in for the reference's localhost:1234 static
    server (test/Remote.hs:53-57 serves JSON-Schema-Test-Suite/remotes;
    referencesViaFilesystem' — Fetch.hs:87-101 — is the read-a-file
    transport this composes)."""
    import os

    prefix = base if base.endswith("/") else base + "/"

    def fetch(uri: str) -> bytes:
        if not uri.startswith(prefix):
            raise FileNotFoundError(f"{uri!r} outside served base {prefix!r}")
        rel = os.path.normpath(uri[len(prefix):])
        if rel.startswith(("..", "/")):
            raise FileNotFoundError(f"{uri!r} escapes served root")
        with open(os.path.join(root, rel), "rb") as f:
            return f.read()

    return fetch


def fetch_and_validate(
    schema: Any,
    instance: Any,
    fetch: Fetcher,
    uri: str | None = None,
    registry: dict[str, Any] | None = None,
) -> list[Failure]:
    """Fetch referenced documents to fixpoint, meta-schema-check the
    root schema, then validate ``instance`` — the reference's
    ``fetchHTTPAndValidate`` / ``fetchFilesystemAndValidate`` flow
    (Draft4.hs:60-81, 93-112) with the transport injected. Raises
    FetchFailure (request class) or SchemaInvalid (schema class);
    returns the data-class failures (empty = valid)."""
    docs = fetch_refs(schema, fetch, uri=uri, registry=registry)
    v = Draft4Validator(schema, registry=docs, base_uri=uri or "", check_schema=True)
    return v.validate(instance)
