"""Similarity search over embedding columns.

- ``cosine_topk_bruteforce``: broadcast the (small) query set, cross
  join against the corpus, exact cosine, window top-k. The baseline /
  oracle. One scan of the corpus, no corpus shuffle for the join
  (queries broadcast); the top-k window shuffles only by query id.
- ``cosine_topk_lsh``: the scale path — IVF-style pre-filter using the
  same random-hyperplane sketch as dedup; only candidate buckets (and
  hamming-adjacent probes) get exact scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hjsonschema_spark.functions import cosine_similarity, fan_out


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. Output: query_id, vec_id,
    cosine, rank (1-based, ties broken by vec_id for determinism)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).crossJoin(F.broadcast(q))
    cos = cosine_similarity(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.select(query_id_col, id_col, cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing at least one
    band signature with a query (OR-amplified multi-band sign-LSH, see
    ``hyperplane_band_sketches``), plus 1-bit multi-probe flips of each
    query band for extra recall. Corpus side carries IDS ONLY through
    the banded join (vectors would be duplicated x bands); candidates
    join back to vectors for exact scoring. Candidate fraction per
    probe ~2^-planes_per_band; recall tunes with bands."""
    from hjsonschema_spark.functions.columns import hyperplane_band_sketches

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    corpus = fan_out(corpus)
    sketches = hyperplane_band_sketches(F.col(vec_col), dim, bands, planes_per_band, seed)
    c_sk = corpus.select(F.col(id_col), F.posexplode(sketches).alias("band_idx", "band_sig"))
    q_sk = queries.select(
        F.col(query_id_col), F.posexplode(sketches).alias("band_idx", "band_sig")
    )
    # multi-probe: each query band bucket plus all its 1-bit flips
    probes = F.array(
        F.col("band_sig"),
        *[F.col("band_sig").bitwiseXOR(F.lit(1 << j)) for j in range(planes_per_band)],
    )
    q_probed = q_sk.select(
        query_id_col, "band_idx", F.explode(probes).alias("band_sig")
    ).dropDuplicates()
    cand_ids = (
        c_sk.join(F.broadcast(q_probed), ["band_idx", "band_sig"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    cand = cand_ids.join(corpus.select(id_col, vec_col), id_col).join(
        F.broadcast(queries.select(query_id_col, F.col(vec_col).alias("_qvec"))),
        query_id_col,
    )
    cos = cosine_similarity(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select(query_id_col, id_col, cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
