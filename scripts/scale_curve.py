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

Declared-quadratic baselines (uncapped ngram_jaccard — the r14 run
KILLED it >20 min at 10x) are opt-in via --include-quadratic; every
timed pass also runs under --timeout seconds (default 900) and records
"killed" in the JSON instead of hanging the script (r14 advice).

Usage: python scripts/scale_curve.py [--passes 2] [--factor 10]
           [--queries a,b,c] [--include-quadratic] [--timeout 900]
Prints one JSON line; paste the table into docs/SHUFFLES.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import threading
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mine_database_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (table, id columns to remap) — remapped ids stay disjoint across copies
TABLES = {
    "lineitem": ["l_orderkey", "l_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 1_000_000_000

DEFAULT_QUERIES = (
    "pagerank",
    "triangle_count_deg",
    "knn_graph_ivf",
    "semantic_dedup",
)
# measured-quadratic at a frozen config; opt-in only (r14: killed >20 min
# at 10x). The capped twin ngram_jaccard_capped is in DEFAULT-able set.
QUADRATIC_QUERIES = ("ngram_jaccard",)


def scaled_dir(factor: int) -> str:
    """Output dir keyed by factor so a --factor change never silently
    reuses a stale corpus (r14 advice); SPARK_GRAFT_SCALE_DIR overrides."""
    env = os.environ.get("SPARK_GRAFT_SCALE_DIR")
    return env if env else f"/tmp/scale_curve_x{factor}"


def build_scaled(spark, factor: int, out: str) -> str:
    for t, id_cols in TABLES.items():
        dst = os.path.join(out, f"{t}.parquet")
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
    return out


def queries(names: list[str]):
    from mine_database_spark.queries.registry import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    base = {n: QUERIES[n] for n in names}

    def ivf_scaled_centroids(spark, sf_dir):
        from mine_database_spark.operators import similarity as sim
        from mine_database_spark.queries.registry import _t

        (e,) = _t(spark, sf_dir, "embeddings")
        return sim.knn_graph_ivf(e, k=5, n_centroids=160, n_assign=4)

    return base, ivf_scaled_centroids


def _run_once(spark, fn, sf_dir: str, timeout_sec: float) -> float | None:
    """One timed noop-write; returns elapsed sec, or None if the pass hit
    the timeout (its Spark jobs are cancelled via a thread-local job
    group, so the session survives for the next query)."""
    group = f"scale-curve-{uuid.uuid4().hex[:8]}"
    err: list[BaseException] = []
    elapsed: list[float] = []

    def work():
        # job-group is thread-local in Spark: tag this pass's jobs so a
        # timeout cancels exactly them
        spark.sparkContext.setJobGroup(group, "scale_curve pass", True)
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            elapsed.append(time.perf_counter() - t0)
        except BaseException as e:  # cancellation surfaces as an exception
            err.append(e)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_sec)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(60)
        return None
    if err:
        if isinstance(err[0], ValueError):  # e.g. the ngram candidate guard
            return "guarded"
        raise err[0]
    return elapsed[0]


def time_query(spark, fn, sf_dir: str, passes: int, timeout_sec: float):
    """min over `passes` timed runs (after one warm run); 'killed' if any
    run (warm included) exceeds timeout_sec, 'guarded' if the query's own
    pre-flight volume guard refused the configuration."""
    first = _run_once(spark, fn, sf_dir, timeout_sec)  # warm
    if first is None:
        return "killed"
    if first == "guarded":
        return "guarded"
    spark.catalog.clearCache()
    best = math.inf
    for _ in range(passes):
        spark.catalog.clearCache()
        t = _run_once(spark, fn, sf_dir, timeout_sec)
        if t is None:
            return "killed"
        if t == "guarded":
            return "guarded"
        best = min(best, t)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--fresh", action="store_true", help="rebuild the scaled dir")
    ap.add_argument(
        "--queries",
        type=str,
        default=",".join(DEFAULT_QUERIES),
        help="comma-separated registry query names to curve",
    )
    ap.add_argument(
        "--include-quadratic",
        action="store_true",
        help=f"also run the declared-quadratic baselines {QUADRATIC_QUERIES}",
    )
    ap.add_argument(
        "--timeout",
        type=float,
        default=900.0,
        help="per-pass wall clock cap in seconds; exceeded -> 'killed'",
    )
    ap.add_argument(
        "--skip-ivf-scaled",
        action="store_true",
        help="skip the extra 160-centroid IVF run at 10x",
    )
    args = ap.parse_args()

    out = scaled_dir(args.factor)
    if args.fresh and os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    names = [n for n in args.queries.split(",") if n]
    if args.include_quadratic:
        names += [n for n in QUADRATIC_QUERIES if n not in names]

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, args.factor, out)

    base, ivf_scaled = queries(names)
    results = {}
    for name, fn in base.items():
        t1 = time_query(spark, fn, SRC, args.passes, args.timeout)
        t10 = (
            time_query(spark, fn, out, args.passes, args.timeout)
            if t1 != "killed"
            else "killed"
        )
        exp = (
            round(math.log(t10 / t1) / math.log(args.factor), 2)
            if isinstance(t1, float) and isinstance(t10, float)
            else None
        )
        results[name] = {"t_1x_sec": t1, "t_10x_sec": t10, "exponent": exp}
        print(f"# {name}: {results[name]}", file=sys.stderr)
    if "knn_graph_ivf" in base and not args.skip_ivf_scaled:
        t10s = time_query(spark, ivf_scaled, out, args.passes, args.timeout)
        results["knn_graph_ivf_160c"] = {
            "t_10x_sec": t10s,
            "note": "10x corpus with n_centroids scaled 16->160 (production path)",
        }
        print(f"# knn_graph_ivf_160c: {t10s}", file=sys.stderr)
    print(
        json.dumps(
            {
                "factor": args.factor,
                "src": SRC,
                "timeout_sec": args.timeout,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
