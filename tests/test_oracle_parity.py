"""Local replica of the driver's t2 correctness gate: run every registry
query on Spark and its oracle on DuckDB, compare row count, column names,
and order-insensitive values.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from mine_database_spark.queries.registry import ORACLES, QUERIES

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # NULL-safe total order: None sorts before any value
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((v is not None, "" if v is None else str(type(v)), v) for v in t),
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_smoke, name):
    sdf = QUERIES[name](spark, sf_smoke)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_smoke)
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sset = _rows_to_set(scols, srows)
    dset = _rows_to_set(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_rows_only_queries_run(spark, sf_smoke):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, sf_smoke)
        assert df.count() >= 0, name
