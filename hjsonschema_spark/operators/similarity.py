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


# -- IVF (inverted-file) ANN --------------------------------------------------
#
# The standard coarse-quantizer scale path (cf. FAISS IVF / Jégou et al.
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
# public literature): train a small spherical-k-means codebook on a
# BOUNDED sample (codebooks are always trained on a sample — k*dim
# floats live on the driver, never the corpus), assign every corpus
# vector to its nearest centroid with a pure column expression (one
# scan, no shuffle, no UDF), then answer queries by exact-scoring only
# the n_probe nearest inverted lists (~n_probe/n_clusters of the
# corpus per query).


def _unit(col):
    from hjsonschema_spark.functions.columns import l2_norm

    n = l2_norm(col)
    return F.when(n > 0, F.transform(col, lambda x: x / n))


def train_ivf_codebook(
    corpus: DataFrame,
    n_clusters: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    max_train: int = 25_600,
    seed: int = 42,
):
    """Spherical k-means codebook: list of n_clusters unit vectors.

    Training sample: the max_train corpus rows with the smallest
    xxhash64(id, seed) — deterministic, order-independent, one
    TakeOrdered job (per-partition heaps, no full sort). Lloyd
    iterations run driver-side in numpy over the bounded sample;
    assignment of the FULL corpus stays distributed (ivf_assign)."""
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(int(max_train))
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    k = min(int(n_clusters), len(x))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(int(iters)):
        sims = x @ cent.T  # cosine == dot on unit vectors
        assign = sims.argmax(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c = x[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
            else:  # empty cluster: reseed on the worst-served point
                cent[j] = x[sims.max(axis=1).argmin()]
    return [[float(v) for v in c] for c in cent]


def _centroid_scores(vec_col, codebook) -> "F.Column":
    """array<double> of cosine scores of `vec_col` against every
    codebook centroid — a single codegen-able expression (centroids are
    literals), evaluated in one pass with no shuffle."""
    cents = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in codebook])
    u = _unit(vec_col)
    return F.transform(
        cents,
        lambda c: F.aggregate(F.zip_with(u, c, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v),
    )


def ivf_assign(
    corpus: DataFrame, codebook, vec_col: str = "embedding"
) -> DataFrame:
    """Append `cluster_id` = nearest-centroid index (0-based). One scan,
    expression-only; at scale, write the result partitioned/bucketed by
    cluster_id so probes prune at the file level."""
    scores = _centroid_scores(F.col(vec_col), codebook)
    best = F.expr(
        "array_position({0}, array_max({0})) - 1".format("_ivf_scores")
    )
    return (
        corpus.withColumn("_ivf_scores", scores)
        .withColumn("cluster_id", best.cast("int"))
        .drop("_ivf_scores")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebook=None,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF probing: score each query against only
    the corpus vectors whose cluster is among the query's n_probe
    nearest centroids. Join shape for scale: corpus equi-shuffled once
    on cluster_id (or pre-bucketed by ivf_assign at write time — then
    zero shuffle), queries broadcast with their probe lists exploded
    (n_queries x n_probe rows). Candidate fraction ~= n_probe /
    n_clusters; recall tunes with n_probe (and exactly 1.0 when
    n_probe == n_clusters)."""
    if codebook is None:
        codebook = train_ivf_codebook(
            corpus, n_clusters, vec_col, id_col, iters=iters, seed=seed
        )
    assigned = ivf_assign(fan_out(corpus.select(id_col, vec_col)), codebook, vec_col)
    scores = _centroid_scores(F.col(vec_col), codebook)
    n_probe = min(int(n_probe), len(codebook))
    # n_probe nearest centroids: sort (score desc, index asc) via a
    # struct array_sort — deterministic under score ties
    probes = F.expr(
        "slice(transform(array_sort(transform(sequence(0, size(_q_scores) - 1), "
        "i -> struct(-element_at(_q_scores, i + 1) AS s, i AS idx))), p -> p.idx), "
        f"1, {n_probe})"
    )
    q_probed = (
        queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
        .withColumn("_q_scores", _centroid_scores(F.col("_qvec"), codebook))
        .select(query_id_col, "_qvec", F.explode(probes).alias("cluster_id"))
        .withColumn("cluster_id", F.col("cluster_id").cast("int"))
    )
    cand = assigned.join(F.broadcast(q_probed), "cluster_id")
    cos = cosine_similarity(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select(query_id_col, id_col, cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
