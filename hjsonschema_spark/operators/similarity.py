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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hjsonschema_spark.functions import cosine_similarity, fan_out

# Query sets above this row count are not broadcast (an unconditional
# hint would OOM the executors if a caller passes 10M queries — each
# executor holds the full set); the join falls back to a shuffle join
# and AQE still converts it at runtime if the build side turns out
# small. 100k queries x 64 float64 dims ~ 50 MB broadcast — safe.
DEFAULT_QUERY_BROADCAST_LIMIT = 100_000


def _is_small(queries: DataFrame, limit: int) -> bool:
    """limit-bounded count: scanning stops at limit+1 rows, so probing
    a huge query set costs one cheap job, not a full count."""
    return limit > 0 and queries.limit(limit + 1).count() <= limit


def _maybe_broadcast(df: DataFrame, small: bool) -> DataFrame:
    return F.broadcast(df) if small else df


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    broadcast_limit: int = DEFAULT_QUERY_BROADCAST_LIMIT,
) -> DataFrame:
    """Exact top-k neighbors per query. Output: query_id, vec_id,
    cosine, rank (1-based, ties broken by vec_id for determinism).

    Contract: intended for SMALL query sets (every corpus row scores
    every query). The query side is broadcast only when it is provably
    <= broadcast_limit rows; above that the crossJoin degrades to a
    partitioned nested-loop — at that point use cosine_topk_lsh/ivf."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    small = _is_small(queries, broadcast_limit)
    scored = fan_out(corpus.select(F.col(id_col), F.col(vec_col)), by=(id_col,)).crossJoin(
        _maybe_broadcast(q, small)
    )
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
    planes: list | None = None,
    broadcast_limit: int = DEFAULT_QUERY_BROADCAST_LIMIT,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing at least one
    band signature with a query (OR-amplified multi-band sign-LSH, see
    ``hyperplane_band_sketches``), plus 1-bit multi-probe flips of each
    query band for extra recall. Corpus side carries IDS ONLY through
    the banded join (vectors would be duplicated x bands); candidates
    join back to vectors for exact scoring. Candidate fraction per
    probe ~2^-planes_per_band; recall tunes with bands.

    The query side (probed band keys, then vectors) is broadcast only
    when provably <= broadcast_limit rows; larger query sets take the
    shuffle path (AQE may still broadcast at runtime).

    ``planes``: explicit projection matrix (user-trained, or literal
    constants shared with a DuckDB oracle) — see
    ``hyperplane_band_sketches``."""
    from hjsonschema_spark.functions.columns import hyperplane_band_sketches

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    corpus = fan_out(corpus, by=(id_col,))
    sketches = hyperplane_band_sketches(
        F.col(vec_col), dim, bands, planes_per_band, seed, planes=planes
    )
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
    small = _is_small(queries, broadcast_limit)
    cand_ids = (
        c_sk.join(_maybe_broadcast(q_probed, small), ["band_idx", "band_sig"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    cand = cand_ids.join(corpus.select(id_col, vec_col), id_col).join(
        _maybe_broadcast(
            queries.select(query_id_col, F.col(vec_col).alias("_qvec")), small
        ),
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
# vector to its nearest centroid in one scan with no shuffle, then
# answer queries by exact-scoring only the n_probe nearest inverted
# lists (~n_probe/n_clusters of the corpus per query).
#
# Assignment/probing use an Arrow-batched pandas UDF (one numpy matmul
# per batch), NOT SQL higher-order functions: transform/aggregate
# lambdas run INTERPRETED in Spark (no whole-stage codegen), and k
# interpreted dot products per row measured ~40x slower than the
# vectorized batch matmul.


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


def _batch_scores(codebook):
    """(batch x dim) -> (batch x k) cosine scores vs the codebook as one
    numpy matmul over unit-normalized rows. Shared by assignment (argmax)
    and query probing (top-n argsort); NULL/zero vectors score 0."""
    C = np.asarray(codebook, dtype=np.float64).T  # dim x k

    def scores(v) -> "np.ndarray":
        dim = C.shape[0]
        X = np.asarray(
            [x if x is not None and len(x) == dim else [0.0] * dim for x in v],
            dtype=np.float64,
        )
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        np.divide(X, norms, out=X, where=norms > 0)
        return X @ C

    return scores


def _assign_udf(codebook):
    from pyspark.sql.functions import pandas_udf

    scores = _batch_scores(codebook)

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        # np.argmax = first max = lowest centroid index on ties (same
        # contract as array_position-of-max)
        return pd.Series(scores(v.tolist()).argmax(axis=1).astype("int32"))

    return _assign


def _probes_udf(codebook, n_probe: int):
    from pyspark.sql.functions import pandas_udf

    scores = _batch_scores(codebook)

    @pandas_udf("array<int>")
    def _probes(v: pd.Series) -> pd.Series:
        s = scores(v.tolist())
        # stable argsort of -score => score desc, centroid index asc ties
        order = np.argsort(-s, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    return _probes


def ivf_assign(
    corpus: DataFrame, codebook, vec_col: str = "embedding"
) -> DataFrame:
    """Append `cluster_id` = nearest-centroid index (0-based). One scan,
    one Arrow-batched matmul per batch, no shuffle; at scale, write the
    result partitioned/bucketed by cluster_id so probes prune at the
    file level."""
    return corpus.withColumn("cluster_id", _assign_udf(codebook)(F.col(vec_col)))


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
    broadcast_limit: int = DEFAULT_QUERY_BROADCAST_LIMIT,
) -> DataFrame:
    """Approximate top-k via IVF probing: score each query against only
    the corpus vectors whose cluster is among the query's n_probe
    nearest centroids. Join shape for scale: corpus equi-shuffled once
    on cluster_id (or pre-bucketed by ivf_assign at write time — then
    zero shuffle), queries broadcast with their probe lists exploded
    (n_queries x n_probe rows) when the base query set is provably
    <= broadcast_limit rows, else a shuffle join on cluster_id.
    Candidate fraction ~= n_probe / n_clusters; recall tunes with
    n_probe (and exactly 1.0 when n_probe == n_clusters)."""
    if codebook is None:
        codebook = train_ivf_codebook(
            corpus, n_clusters, vec_col, id_col, iters=iters, seed=seed
        )
    assigned = ivf_assign(fan_out(corpus.select(id_col, vec_col), by=(id_col,)), codebook, vec_col)
    n_probe = min(int(n_probe), len(codebook))
    q_probed = (
        queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
        .withColumn("_probes", _probes_udf(codebook, n_probe)(F.col("_qvec")))
        .select(query_id_col, "_qvec", F.explode("_probes").alias("cluster_id"))
    )
    cand = assigned.join(
        _maybe_broadcast(q_probed, _is_small(queries, broadcast_limit)), "cluster_id"
    )
    cos = cosine_similarity(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select(query_id_col, id_col, cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
