"""Skew-handling utilities (north rule: "partitioning / shuffle / skew
handled explicitly").

Layers of defense, outermost first:

1. AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py):
   splits skewed shuffle-join partitions at runtime.
2. Partial (map-side) aggregation: every groupBy the engine issues
   pre-aggregates before the shuffle, so hot keys shrink to one row per
   input partition — uniqueness/contiguity are skew-safe by shape.
3. Salted two-stage aggregation (here): for aggregations whose groups
   are so hot that even partial aggregation leaves one reducer with a
   disproportionate merge load, split each group into `buckets`
   sub-groups first (PAPERS.md: DS2, ICDE 2021, for background).
4. Window passes order within a group and cannot be salted without
   breaking order semantics; they rely on the generator/domain bound on
   group size (conversations are bounded) plus 1-2.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], buckets: int = 64, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt derived from the FULL row hash, uniform
    within each group of `cols`."""
    others = [c for c in df.columns if c not in cols]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*others) if others else F.monotonically_increasing_id(), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    group_by: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 64,
) -> DataFrame:
    """Two-stage aggregation for skewed groups: stage 1 aggregates
    (group, salt) — hot groups spread over `buckets` reducers — stage 2
    merges the per-salt partials (at most `buckets` rows per group).

    `partial_aggs` aggregate raw rows; `final_aggs` merge the partial
    columns (e.g. partial `F.count(...)` then final `F.sum(...)`)."""
    salted = with_salt(df, group_by, buckets)
    stage1 = salted.groupBy(*group_by, "_salt").agg(*partial_aggs)
    return stage1.groupBy(*group_by).agg(*final_aggs)


def salted_count(df: DataFrame, group_by: list[str], buckets: int = 64) -> DataFrame:
    """Skew-proof groupBy-count: count per (group, salt), then sum."""
    return salted_agg(
        df,
        group_by,
        [F.count(F.lit(1)).alias("_c")],
        [F.sum("_c").alias("count")],
        buckets,
    )
