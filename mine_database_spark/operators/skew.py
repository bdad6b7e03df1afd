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

from pyspark.sql import DataFrame, Window
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


def key_skew_audit(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter audit for a prospective join/group key: the top-N keys
    by frequency with their share of all rows — the diagnostic read BEFORE
    choosing a salting factor, a df_cap, or an AQE skew threshold (a key
    holding 30% of the rows means every downstream shuffle on it has a
    30% straggler).

    Returns (key [as string], n, share_pct rounded 4, rank) for the top_n
    most frequent keys; NULL keys count as the literal key '∅' so the
    null-skew case (the classic outer-join pathology) is visible rather
    than silently dropped.

    Scale: one map-side-combinable count aggregate + a broadcast 1-row
    total; the top-N is a sort-limit (TakeOrderedAndProject), never a full
    sort of the key histogram.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    keyed = df.select(
        F.coalesce(F.col(key_col).cast("string"), F.lit("∅")).alias("key")
    )
    hist = keyed.groupBy("key").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = hist.agg(F.sum("n").alias("__t"))
    top = (
        hist.crossJoin(F.broadcast(total))
        .select("key", "n", F.round(F.col("n") * 100.0 / F.col("__t"), 4).alias("share_pct"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return top.select(
        "key", "n", "share_pct", F.row_number().over(w).cast("int").alias("rank")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: each LEFT (large, skewed-side) row
    picks ONE deterministic salt bucket (xxhash64 of the whole row — never
    of the key, which would re-collapse the hot key into one bucket), and
    the RIGHT (smaller) side replicates once per salt, so a key holding
    30% of the left rows spreads over n_salts reducers instead of one
    straggler.

    AQE's skew-join handles most cases at runtime; explicit salting still
    matters when (a) the skewed join is NOT the last stage (AQE splits only
    sort-merge partitions it can see), (b) the downstream aggregate keys on
    the same hot key, or (c) deterministic task sizing is required.

    Semantics equal a plain equi-join (pinned in pytest); `how` supports
    inner/left. Cost: right side × n_salts rows — size the factor so
    |right|·n_salts stays broadcastable or comfortably shuffle-able.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    # salt = deterministic per-row uniform (never derived from the key —
    # that would put every copy of the hot key in one bucket again)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
