"""As-of (temporal) join: for each left row, attach the latest right row at
or before the left timestamp (backward) or the earliest at/after (forward),
per key — the operator behind point-in-time feature lookups, trade/quote
alignment, and "most recent prior event" enrichment.

The reference engine has no as-of join; this is one of the engine-level
extensions a large-scale pipeline needs (pattern: kdb+ `aj`, pandas
`merge_asof`, DuckDB `ASOF JOIN`).

Spark-first design — NOT a range join: a range/theta join explodes to
O(left x right-per-key) intermediate rows before picking the max. Instead the
two sides are unioned with a side tag and a single window
`last(payload, ignorenulls=True)` over (key, ts) carries the most recent
right payload onto each left row:

  * exactly ONE hash exchange (on the key) + one sort — the same cost as a
    groupBy; no join operator appears in the physical plan at all;
  * at 100 TB both sides stream through the sort; window state per key is one
    payload row (the running `last`), never the full right history;
  * skewed keys get AQE's standard window handling, and the union preserves
    column pruning + filter pushdown on both scans.

Tie rules: at equal timestamps the right row sorts before (inclusive,
default) or after (strict) the left row; duplicate right timestamps within a
key are ordered by `right_tiebreak` (NULLs first, so any non-NULL tie key
wins over a NULL one) and finally by a stable hash of the right row itself,
so `last()` is deterministic even when `right_tiebreak` contains NULLs or is
omitted. Timestamps must be integral (the internal time axis is long);
fractional types are rejected rather than silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    *,
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join. Returns all `left` columns plus `payload` columns
    from `right` (NULL when no right row qualifies) plus `asof_ts` (the
    matched right timestamp, NULL on no match).

    on             join key column name(s), present in both sides
    left_ts        numeric (castable-to-long) event-time column on left
    right_ts       numeric event-time column on right
    payload        right columns to carry (must not collide with left's)
    direction      'backward' (right_ts <= left_ts) | 'forward' (>=)
    strict         exclude equal timestamps
    tolerance      max |left_ts - right_ts| in ts units; farther matches → NULL
    right_tiebreak right column ordering duplicates at equal ts (last wins)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(payload) | {"asof_ts"}) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")
    reserved = {"__ats", "__side", "__tie", "__r", "__m"}
    internal = reserved & (set(left.columns) | set(right.columns))
    if internal:
        raise ValueError(f"input columns use reserved internal names: {sorted(internal)}")
    if right_tiebreak is not None and right_tiebreak not in right.columns:
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} is not a column of right "
            f"(has: {right.columns})"
        )
    # the time axis is long internally; a fractional ts would truncate and
    # merge distinct event times — reject instead of silently corrupting
    for side_name, df, ts in (("left", left, left_ts), ("right", right, right_ts)):
        dt = dict(df.dtypes).get(ts)
        if dt is None:
            raise ValueError(f"{side_name}_ts {ts!r} is not a column of {side_name}")
        if dt in ("float", "double") or (dt.startswith("decimal") and ",0)" not in dt):
            raise ValueError(
                f"{side_name}_ts {ts!r} has fractional type {dt}; as-of timestamps "
                "must be integral (cast/scale to long first, e.g. millis)"
            )

    # forward = backward on the negated time axis
    sign = -1 if direction == "forward" else 1
    # right sorts BEFORE left at equal ts for inclusive semantics (the
    # running last() has already seen it), AFTER for strict
    l_side, r_side = (1, 0) if not strict else (0, 1)

    left_extra = [c for c in left.columns if c not in keys]
    ldt = dict(left.dtypes)
    # tie-break on the RAW column (columns of any orderable type sort fine in
    # a window): casting to long would collapse fractional values (0.5 vs 0.9)
    # or non-numeric strings into equal/NULL keys and lose determinism
    if right_tiebreak is not None:
        tie_dt = dict(right.dtypes)[right_tiebreak]
        tie, l_tie = F.col(right_tiebreak), F.lit(None).cast(tie_dt)
    else:
        tie, l_tie = F.lit(0).cast("long"), F.lit(0).cast("long")

    # the right row rides the union as ONE non-null struct so a single
    # last(ignorenulls) carries it; per-field last() would skip legitimately
    # NULL payload values back to an older right row
    r_u = right.select(
        *keys,
        (F.col(right_ts).cast("long") * sign).alias("__ats"),
        F.lit(r_side).alias("__side"),
        tie.alias("__tie"),
        F.struct(
            F.col(right_ts).cast("long").alias("ts"), *[F.col(p) for p in payload]
        ).alias("__r"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left_extra],
    )
    rstruct_dt = dict(r_u.dtypes)["__r"]
    l_u = left.select(
        *keys,
        (F.col(left_ts).cast("long") * sign).alias("__ats"),
        F.lit(l_side).alias("__side"),
        l_tie.alias("__tie"),
        F.lit(None).cast(rstruct_dt).alias("__r"),
        *left_extra,
    )
    u = r_u.unionByName(l_u)

    # NULLs-first so a non-NULL tie key always beats a NULL one; the stable
    # row hash breaks remaining ties (duplicate ts + equal/NULL tie keys) the
    # same way on every run — left rows all hash the NULL struct equally and
    # are never ambiguous among themselves (last() reads only __r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ats").asc(),
            F.col("__side").asc(),
            F.col("__tie").asc_nulls_first(),
            F.xxhash64(F.col("__r")).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *u.columns, F.last("__r", ignorenulls=True).over(w).alias("__m")
    ).where(F.col("__side") == l_side)

    left_ts_long = F.col("__ats") * sign
    ok = F.col("__m").isNotNull()
    if tolerance is not None:
        ok = ok & (F.abs(left_ts_long - F.col("__m.ts")) <= F.lit(int(tolerance)))
    out_cols = [F.col(k) for k in keys] + [F.col(c) for c in left_extra]
    out_cols.append(F.when(ok, F.col("__m.ts")).otherwise(F.lit(None)).alias("asof_ts"))
    out_cols += [F.when(ok, F.col(f"__m.{p}")).otherwise(F.lit(None)).alias(p) for p in payload]
    return matched.select(*out_cols)
