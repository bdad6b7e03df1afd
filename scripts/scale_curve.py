#!/usr/bin/env python
"""Measured scale curves for the most expensive registry plans.

The 100x-scale claims in docs/SHUFFLES.md rest on plan shape (bounded
candidate volume, O(edges)/round, df caps); this script MEASURES the
growth instead: it synthesizes a 10x corpus from sf0.1 by unioning 10
id-remapped copies of each input table (no new testdata — the driver's
parquet is read-only and replicas land under /tmp), times each headline
plan at 1x and 10x, and reports the empirical scaling exponent
log10(t_10x / t_1x). An exponent near 1 = linear; near 2 = quadratic.

Replication semantics are deliberate:
- lineitem id-remaps BOTH orderkey and partkey per copy, so the
  co-purchase graph becomes 10 disjoint copies — pagerank/triangle work
  is per-edge/per-wedge local, so this is exactly the 10x-edges regime.
- documents/embeddings keep their text/vectors IDENTICAL across copies
  (only ids remap): a replicated corpus is the dup-heavy worst case the
  dedup operators exist for, so their df caps / bucket caps / list-size
  mechanics get stressed rather than dodged.

knn_graph_ivf runs twice at 10x: at the registered FIXED 16 centroids
(candidate volume ~ n^2 * n_assign^2 / n_centroids — quadratic at a
frozen config, the documented behavior) and at 160 centroids (the
production path: scale n_centroids with n, restoring ~constant list
sizes). Both numbers belong in the doc — the first is the trap, the
second the steer.

Usage: python scripts/scale_curve.py [--passes 2] [--factor 10]
Prints one JSON line; paste the table into docs/SHUFFLES.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mine_database_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale_curve_x10")

# (table, id columns to remap) — remapped ids stay disjoint across copies
TABLES = {
    "lineitem": ["l_orderkey", "l_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 1_000_000_000


def build_scaled(spark, factor: int) -> str:
    for t, id_cols in TABLES.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(factor):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * STRIDE))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(dst)
    return OUT


def queries():
    from mine_database_spark.queries.registry import QUERIES

    base = {
        n: QUERIES[n]
        for n in (
            "pagerank",
            "triangle_count_deg",
            "knn_graph_ivf",
            "ngram_jaccard",
            "semantic_dedup",
        )
    }

    def ivf_scaled_centroids(spark, sf_dir):
        from mine_database_spark.operators import similarity as sim
        from mine_database_spark.queries.registry import _t

        (e,) = _t(spark, sf_dir, "embeddings")
        return sim.knn_graph_ivf(e, k=5, n_centroids=160, n_assign=4)

    return base, ivf_scaled_centroids


def time_query(spark, fn, sf_dir: str, passes: int) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    spark.catalog.clearCache()
    best = math.inf
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--fresh", action="store_true", help="rebuild the scaled dir")
    args = ap.parse_args()

    if args.fresh and os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT, exist_ok=True)

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, args.factor)

    base, ivf_scaled = queries()
    results = {}
    for name, fn in base.items():
        t1 = time_query(spark, fn, SRC, args.passes)
        t10 = time_query(spark, fn, OUT, args.passes)
        results[name] = {
            "t_1x_sec": t1,
            "t_10x_sec": t10,
            "exponent": round(math.log(t10 / t1) / math.log(args.factor), 2),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)
    t10s = time_query(spark, ivf_scaled, OUT, args.passes)
    results["knn_graph_ivf_160c"] = {
        "t_10x_sec": t10s,
        "note": "10x corpus with n_centroids scaled 16->160 (production path)",
    }
    print(f"# knn_graph_ivf_160c: {t10s}", file=sys.stderr)
    print(json.dumps({"factor": args.factor, "src": SRC, "results": results}))


if __name__ == "__main__":
    main()
