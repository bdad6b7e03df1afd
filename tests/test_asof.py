"""asof_join: brute-force semantics matrix + physical-plan shape.

The operator (operators/asof.py) is union + running-last window; these tests
pin (a) exact agreement with a per-row brute force across direction/strict/
tolerance, (b) the no-join single-exchange plan.
"""

from __future__ import annotations

import itertools
import math

import pytest

from mine_database_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 1, "e"), (1, 15, "f")],
        "k int, lts long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, None), (1, 3, 300.0), (2, 7, 400.0), (2, 8, 500.0), (4, 1, 600.0), (1, 15, 700.0)],
        "k int, rts long, rval double",
    )
    return left, right


def _brute(lrows, rrows, direction, strict, tol):
    out = []
    for k, lts, lval in lrows:
        cand = [r for r in rrows if r[0] == k]
        if direction == "backward":
            cand = [r for r in cand if (r[1] < lts if strict else r[1] <= lts)]
        else:
            cand = [r for r in cand if (r[1] > lts if strict else r[1] >= lts)]
        if tol is not None:
            cand = [r for r in cand if abs(r[1] - lts) <= tol]
        if cand:
            # closest ts wins; ties broken by larger tiebreak (rval here is
            # not the tiebreak — rts+insertion isn't observable, so the test
            # right side has a unique winner at every tied ts via max rval)
            keyfn = (lambda r: (r[1], _nn(r[2]))) if direction == "backward" else (lambda r: (-r[1], _nn(r[2])))
            m = max(cand, key=keyfn)
            out.append((k, lts, lval, m[1], m[2]))
        else:
            out.append((k, lts, lval, None, None))
    return sorted(out, key=lambda t: (t[0], t[1]))


def _nn(v):
    return -math.inf if v is None else v


@pytest.mark.parametrize(
    "direction,strict,tol",
    list(itertools.product(["backward", "forward"], [False, True], [None, 4])),
)
def test_asof_matches_brute_force(spark, frames, direction, strict, tol):
    left, right = frames
    lrows = [tuple(r) for r in left.collect()]
    rrows = [tuple(r) for r in right.collect()]
    got = asof_join(
        left, right, "k", "lts", "rts", ["rval"],
        direction=direction, strict=strict, tolerance=tol, right_tiebreak="rval",
    )
    g = sorted(((r.k, r.lts, r.lval, r.asof_ts, r.rval) for r in got.collect()), key=lambda t: (t[0], t[1]))
    assert g == _brute(lrows, rrows, direction, strict, tol)


def test_asof_plan_has_no_join_single_exchange(spark, frames):
    left, right = frames
    plan = asof_join(left, right, "k", "lts", "rts", ["rval"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_payload_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rval", "lval"), "k", "lts", "rts", ["lval"])


def test_asof_unknown_tiebreak_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="right_tiebreak"):
        asof_join(left, right, "k", "lts", "rts", ["rval"], right_tiebreak="nope")


def test_asof_fractional_ts_raises(spark, frames):
    left, right = frames
    from pyspark.sql import functions as F

    lfrac = left.withColumn("lts", F.col("lts") + 0.5)
    with pytest.raises(ValueError, match="fractional"):
        asof_join(lfrac, right, "k", "lts", "rts", ["rval"])
    rfrac = right.withColumn("rts", F.col("rts").cast("double"))
    with pytest.raises(ValueError, match="fractional"):
        asof_join(left, rfrac, "k", "lts", "rts", ["rval"])


def test_asof_null_tiebreak_is_deterministic(spark):
    """Duplicate right timestamps whose tie keys are BOTH NULL: the winner is
    chosen by a stable row hash, so it is the same across runs and across
    input partitionings (previously arbitrary)."""
    left = spark.createDataFrame([(1, 10, "a"), (1, 20, "b")], "k int, lts long, lval string")
    right = spark.createDataFrame(
        [(1, 10, None, "x"), (1, 10, None, "y"), (1, 10, None, "z"), (1, 15, 1.0, "w")],
        "k int, rts long, tie double, pay string",
    )
    runs = []
    for r in (right, right.repartition(7), right.orderBy("pay"), right.orderBy("rts")):
        got = asof_join(left, r, "k", "lts", "rts", ["pay"], right_tiebreak="tie")
        runs.append(sorted((x.k, x.lts, x.asof_ts, x.pay) for x in got.collect()))
    assert runs[0] == runs[1] == runs[2] == runs[3]
    by_lts = {lts: pay for _, lts, _, pay in runs[0]}
    # non-NULL tie key (rts=15) wins for the lts=20 row
    assert by_lts[20] == "w"
    assert by_lts[10] in ("x", "y", "z")
