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


def _sketch(vec, dim: int, n_planes: int, seed: int):
    bits = []
    for j in range(n_planes):
        comps = F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d, j=j: (F.pmod(F.xxhash64(F.lit(seed), F.lit(j), d), F.lit(2000001)) - 1000000).cast("double") / 1000000.0,
            ),
            lambda x, p: x * p,
        )
        dot = F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, 1).otherwise(0))
    return F.conv(F.concat(*[b.cast("string") for b in bits]), 2, 10).cast("long")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose hyperplane
    sketch is within hamming distance 1 of the query's sketch (bucket +
    single-bit probes). Recall tunes with n_planes; candidates shrink
    ~2^-n_planes per probe."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col), _sketch(F.col(vec_col), dim, n_planes, seed).alias("sketch"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec"), _sketch(F.col(vec_col), dim, n_planes, seed).alias("qsketch")
    )
    # multi-probe: query bucket plus all 1-bit flips
    probes = F.array(F.col("qsketch"), *[F.col("qsketch").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)])
    q_probed = q.select(query_id_col, "_qvec", F.explode(probes).alias("sketch"))
    cand = c.join(F.broadcast(q_probed), "sketch")
    cos = cosine_similarity(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select(query_id_col, id_col, cos.alias("cosine"))
        .dropDuplicates([query_id_col, id_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
