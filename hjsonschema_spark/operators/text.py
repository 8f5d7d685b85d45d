"""Text-analysis operators (documents table): language ID, quality
scoring, token counting, fingerprinting. All pure column expressions —
each has a DuckDB-SQL twin in __spark_entry__.oracle_sql()."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hjsonschema_spark.functions import doc_fingerprint, normalize_text, tokens

# tiny stopword lists for the n-gram/stopword language heuristic;
# deliberately small & frozen so the SQL oracle can embed them verbatim
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "ich", "auf"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "es", "por"),
}


def token_count(col: Column) -> Column:
    """Whitespace+punct token count (BPE-ish proxy: words + digits)."""
    return F.size(tokens(col))


def _stopword_hits(col: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: _stopword_hits(col, lang) for lang in STOPWORDS}


def lang_id(col: Column) -> Column:
    """argmax of stopword hits; ties/zero => 'und' (undetermined).
    Deterministic tie-break: language with the most hits, then
    alphabetical order."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["hits"] > 0))
    # array_max on struct compares field-by-field: hits first, then
    # lang — i.e. max hits, tie-break by LAST alphabetical lang; invert
    # lang order for the conventional first-alphabetical tiebreak is
    # not oracle-friendly, so we pin: max hits, lexicographically
    # greatest lang among ties (documented contract).
    return F.coalesce(best["lang"], F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score in one projection."""
    col = F.col(text_col)
    n_chars = F.length(col)
    toks = tokens(col)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tokens,
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
    k-row heads), never a full sort of the token dictionary."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.length(normalize_text(F.col(text_col))).alias("norm_len"),
    )
