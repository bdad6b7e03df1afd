"""Skew-aware aggregation utilities.

AQE splits skewed *join* partitions automatically, but a skewed *aggregation
state* (one hot group collecting a huge set/list) still lands on a single
reducer. The fix is classic salting: spread one key's values over n_salts
partial aggregates, then merge the partials — two map-side-combinable
stages, bounded per-task state at any scale.

Reference context: the reference's analogue is Mongo's 16MB-document
adjacency overflow handling (databases.py:290-473) — the same "one hot key
exceeds a unit of state" problem, solved relationally here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """collect_set with salted two-stage aggregation; result arrays sorted.

    Salt = hash(value) % n_salts, so duplicate values of a key land in the
    same partial set (dedup stays exact) while a hot key's state spreads
    over n_salts reducers. Output equals
    groupBy(keys).agg(array_sort(collect_set(value))).
    """
    out = out_col or f"{value_col}_set"
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    partial = df.groupBy(*key_cols, salt.alias("__salt")).agg(
        F.collect_set(value_col).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.array_sort(F.flatten(F.collect_list("__partial"))).alias(out)
    )


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact count-distinct per key without a hot-reducer: distinct counts of
    the salted partials sum to the key's distinct count (salting by the value
    hash makes partials disjoint)."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    partial = df.groupBy(*key_cols, salt.alias("__salt")).agg(
        F.countDistinct(value_col).alias("__n")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__n").cast("bigint").alias(out_col))
