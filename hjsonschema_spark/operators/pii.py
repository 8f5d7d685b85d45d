"""PII detection and redaction over a text column.

A training-data pipeline must find and scrub personally identifiable
information before a corpus ships. This module provides the two halves:

- ``pii_signals`` — per-document match counts per PII category, a pure
  codegen projection (``regexp_count`` per pattern; no shuffle, no UDF).
- ``redact_pii`` — masked text via chained ``regexp_replace``, one pass
  per category in a DOCUMENTED, deterministic order (URLs first so an
  email inside a URL is consumed by the URL mask, not split).

Reference lineage: this is the `pattern` keyword
(/root/reference/src/JSONSchema/Validator/Draft4/String.hs:44-52 —
unanchored regex over a string instance) specialized to a fixed PII
vocabulary and lifted to a redaction transform. Patterns are written in
the common subset of Java regex (Spark) and RE2 (DuckDB oracle): no
backreferences, no lookaround, ASCII word boundaries only — so the same
pattern string runs on both engines and the driver hash-compares the
redacted bytes.

Scale notes (100 TB): both ops are per-row projections inside the scan
stage — they fuse into whole-stage codegen with whatever else reads the
text column, add zero exchanges, and column-prune to (id, text). The
regexes compile once per codegen'd task, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies in THIS order. URL first (emails and
# IPs embedded in URLs are masked as part of the URL); then the
# higher-specificity numeric patterns (credit card before phone, so a
# 16-digit run is not half-eaten by the looser phone pattern).
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "api_key": r"\b(?:sk|pk|key|token)[-_][A-Za-z0-9]{16,}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}\b",
}


def pii_signals(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII match counts: one ``n_<category>`` long column
    per pattern plus ``n_pii_total``. NULL text ⇒ all counts 0 (vacuous
    NULL rule, as everywhere in the engine)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(text, F.lit(p)).cast("long").alias(f"n_{name}")
        for name, p in pats.items()
    ]
    out = df.select(*id_cols, *counts)
    total = None
    for name in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append ``out_col``: the text with every PII match replaced by
    ``[<CATEGORY>]``, applied category-by-category in PII_PATTERNS
    order. NULL text stays NULL."""
    pats = patterns if patterns is not None else PII_PATTERNS
    col = F.col(text_col)
    for name, p in pats.items():
        col = F.regexp_replace(col, p, f"[{name.upper()}]")
    return df.withColumn(out_col, col)
