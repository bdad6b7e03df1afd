#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-ish action (collect on small results)
so the full plan executes; Spark session build time is excluded from
per-query numbers but included in none (warm-up runs the first query twice).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mine_database_spark.queries.registry import QUERIES
from mine_database_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "content_hash_ids",
    "rule_coverage_cdf",
    "intermediate_rules",
    "mass_range_join",
    "weighted_sample",
    "topk_per_group",
    "copurchase_reach",
    "sessionize",
    "asof_enrich",
    "tumbling_window",
    "dedup_exact",
    "minhash_lsh",
    "simhash",
    "text_quality",
    "quality_rules",
    "pii_scan",
    "token_stats",
    "ann_cosine_topk",
    "spectral_cosine",
    "model_jaccard",
    "tfidf_topk",
    "winnow_fingerprints",
    "adduct_search",
    "ms2_search",
    "product_of_native",
    "order_chain_paths",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("mine-database-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state measurement (JMH/TPC style): run every query shape twice
    # to warm JVM JIT + whole-stage-codegen compilation AND absorb first-touch
    # OS page-cache misses on the parquet files (measured: a single warm-up
    # pass right after boot still leaves 5-8x cold-IO outliers), then DROP all
    # data-level caches so the timed pass re-reads and re-computes every
    # result — only code-path/page-cache warmth carries over, never cached data.
    for _ in range(2):
        for name in HEADLINE:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        # noop sink materializes every output column (count() would let
        # Catalyst prune computed projections)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
