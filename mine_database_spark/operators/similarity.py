"""Similarity search over embedding columns.

Brute-force cosine top-k (baseline, exact) and an LSH-bucketed approximate
variant (the 100 TB scale path). The query side is tiny and broadcast; the
corpus side never shuffles for the brute-force path (map-side compute +
per-partition top-k via window over the broadcast-joined result).

Reference parity: the reference's similarity machinery is fingerprint
Tanimoto against broadcast targets (/root/reference/minedatabase/filters/
similarity.py:515-797); embeddings replace fingerprints here, cosine
replaces Tanimoto, and the same broadcast-the-small-side shape applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mine_database_spark.functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, vec_id, score). Deterministic tiebreak on
    (rounded score desc, vec_id).
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("v"), F.col("qv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Centroids = the n_centroids lowest-id corpus vectors (deterministic; a
    k-means refinement slots in without changing the plan shape). Corpus
    vectors are assigned to their nearest centroid in a single scan-side
    projection (centroids are collected once and inlined as literals — the
    standard small-codebook pattern; no shuffle, no cross join). Queries
    probe their n_probe nearest lists; candidates come from an equi-join on
    the list id.

    Scale: the corpus never shuffles for assignment; the candidate join is
    keyed by list id, so each query touches ~n_probe/n_centroids of the data.
    At 100 TB, partition (or Z-order) the corpus by list id so probes prune
    file scans.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))

    cents = c.orderBy("vec_id").limit(n_centroids).collect()  # small codebook only

    def dot_lit(col, vec):
        return F.aggregate(
            F.zip_with(col, F.array(*[F.lit(float(x)) for x in vec]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def ranked_lists(col):
        return F.reverse(
            F.array_sort(
                F.array(*[
                    F.struct(dot_lit(col, r["v"]).alias("s"), F.lit(int(r["vec_id"])).alias("cid"))
                    for r in cents
                ])
            )
        )

    assigned = c.withColumn("list_id", ranked_lists(F.col("v"))[0]["cid"])
    probes = q.withColumn(
        "probe", F.explode(F.slice(ranked_lists(F.col("qv")), 1, n_probe))
    ).select("query_id", "qv", F.col("probe.cid").alias("list_id"))

    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("v"), F.col("qv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join, then exact cosine
    within the bucket. The scale path — candidate generation is an equi-join
    on the bucket signature instead of a cross join.

    Hyperplanes are deterministic pseudo-random vectors derived from md5 so
    results are reproducible across runs/engines.
    """
    import numpy as np

    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim))

    def sig(col):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(col, F.array(*[F.lit(float(x)) for x in planes[p]]), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
        return F.concat(*bits)

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    cb = c.withColumn("bucket", sig(F.col("v")))
    qb = q.withColumn("bucket", sig(F.col("qv")))
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("v"), F.col("qv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )
