#!/usr/bin/env python
"""Isolated per-query timing + plan capture for the optimization rounds.

Times the named registry queries exactly as bench.py does (noop sink, warm
passes first, cache cleared between passes, min-floor over N passes), but
isolated — one query family at a time, so a regression or win is attributable.
Optionally dumps .explain("formatted") to plans/<tag>/<query>.txt.

Usage:
  python scripts/time_query.py pagerank label_propagation [--passes 4]
      [--warm 2] [--plans plans/r15 --suffix _before] [--sf-dir DIR]
Prints one JSON line {query: min_sec, ...} plus per-pass detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mine_database_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--plans", type=str, default=None,
                    help="directory to write explain('formatted') files into")
    ap.add_argument("--suffix", type=str, default="",
                    help="filename suffix for plan files, e.g. _before")
    ap.add_argument("--sf-dir", type=str,
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from mine_database_spark.queries.registry import QUERIES

    unknown = [n for n in args.queries if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.queries:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"# wrote {path}", file=sys.stderr)

    samples: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.warm):
        for name in args.queries:
            QUERIES[name](spark, args.sf_dir).write.mode(
                "overwrite").format("noop").save()
    for p in range(args.passes):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).write.mode(
                "overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, s in samples.items():
        print(f"# {name}: " + " ".join(f"{t:.3f}" for t in s), file=sys.stderr)
    print(json.dumps({n: round(min(s), 3) for n, s in samples.items()}))


if __name__ == "__main__":
    main()
