"""Text-analysis operators (documents table): language ID, quality
scoring, token counting, fingerprinting. All pure column expressions —
each has a DuckDB-SQL twin in __spark_entry__.oracle_sql()."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hjsonschema_spark.functions import (
    doc_fingerprint,
    normalize_text,
    stopword_run_count,
    token_chars_count,
    token_run_count,
    tokens,
)

# tiny stopword lists for the n-gram/stopword language heuristic;
# deliberately small & frozen so the SQL oracle can embed them verbatim
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "ich", "auf"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "es", "por"),
}


def token_count(col: Column) -> Column:
    """Whitespace+punct token count (BPE-ish proxy: words + digits).
    regexp_count of maximal token runs == size(tokens(col)), but stays
    in whole-stage codegen (the filter() HOF is CodegenFallback)."""
    return token_run_count(col)


def _stopword_hits(col: Column, lang: str) -> Column:
    return stopword_run_count(col, STOPWORDS[lang])


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: _stopword_hits(col, lang) for lang in STOPWORDS}


def lang_id(col: Column) -> Column:
    """argmax of stopword hits; ties/zero => 'und' (undetermined).
    Pinned contract (unchanged): max hits, lexicographically GREATEST
    lang among ties. Implemented as greatest() + a when-chain in
    descending lang order — the same decision procedure as the DuckDB
    oracle's CASE — instead of array_max over a struct array, whose
    filter() HOF forced the whole projection out of codegen."""
    scores = lang_scores(col)
    langs_desc = sorted(STOPWORDS, reverse=True)  # fr, es, en, de
    g = F.greatest(*[scores[lang] for lang in sorted(STOPWORDS)])
    out = F.when(g.isNull() | (g == 0), F.lit("und"))
    for lang in langs_desc[:-1]:
        out = out.when(scores[lang] == g, F.lit(lang))
    return out.otherwise(F.lit(langs_desc[-1]))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score in one projection.
    (Size-GATED fan_out: the unconditional exchange was a measured
    loss at sf0.1 — 0.78s alone vs 1.4s fanned — but the no-fan-out
    shape ran 9x the wall single-core on a 10x single-file input;
    fan_out_if_big keeps the scan-stage shape below ~1 MiB of input
    and parallelizes the regex work above it.)"""
    from hjsonschema_spark.functions import fan_out_if_big

    df = fan_out_if_big(df)
    col = F.col(text_col)
    n_chars = F.length(col)
    # HOF-free forms (identical integers — see functions.columns):
    # size(tokens) -> regexp_count of token runs; aggregate-sum of
    # token lengths -> count of kept token characters. With no
    # CodegenFallback expression left, the whole projection runs in
    # whole-stage codegen WITH subexpression elimination — the HOF form
    # ran interpreted and re-tokenized the text ~14x per row
    # (plans/r06/quality_documents_before.txt operator (3)).
    n_tokens = token_run_count(col)
    mean_tok_len = F.when(
        n_tokens > 0,
        token_chars_count(col).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_en = _stopword_hits(col, "en")
    stop_ratio = F.when(n_tokens > 0, stop_en.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(mean_tok_len, 6).alias("q_mean_tok_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level heavy hitters: the k most frequent tokens with
    counts. Deterministic total order (count desc, token asc) so the
    result SET is stable under ties.

    Scale shape: explode → hash-agg with map-side partial combine (the
    shuffle carries one row per DISTINCT token per task, not per
    occurrence), then a global top-k — Spark executes orderBy().limit(k)
    as TakeOrderedAndProject (per-partition heaps + driver merge of
    k-row heads), never a full sort of the token dictionary.
    Size-gated fan-out: the tokenize+explode is the per-row CPU —
    single-core on a big single-file input without it."""
    from hjsonschema_spark.functions import fan_out_if_big

    toks = fan_out_if_big(df).select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.length(normalize_text(F.col(text_col))).alias("norm_len"),
    )
