"""Event sessionization and time-window aggregation (batch form).

The reference has no streaming operators (SURVEY §2.11); these are the batch
equivalents of the Structured Streaming patterns (session windows via gap,
tumbling windows) expressed with window functions so the identical logic has
a SQL oracle. The streaming wrappers live in mine_database_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _micros(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch microseconds from either a timestamp column or bigint-nanos
    (parquet TIMESTAMP(NANOS) read with nanosAsLong)."""
    field = df.schema[ts_col].dataType
    if isinstance(field, LongType):
        return F.expr(f"{ts_col} div 1000")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids and aggregate per session.

    One shuffle on user_id; both window functions share the same partitioning
    so Catalyst plans a single Window exchange.
    Returns (user_id, session_id, n_events, start_us, end_us, duration_us).
    """
    us = _micros(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(us, F.col(id_col))
    gap_us = gap_minutes * 60 * 1_000_000
    with_sess = (
        events.withColumn("__us", us)
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__new", F.when(F.col("__prev").isNull() | (F.col("__us") - F.col("__prev") > gap_us), 1).otherwise(0)
        )
        .withColumn("session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        with_sess.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Hourly tumbling-window counts and exact sums (cents-integer arithmetic).

    Streaming form: groupBy(window(ts, '1 hour'), event_type) on a stream with
    a watermark — same logical agg, see streaming.windows.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    us = _micros(events, ts_col)
    hour_us = us - (us % F.lit(3_600_000_000))
    return (
        events.groupBy(
            hour_us.alias("hour_us"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
        )
        # 4-decimal half-up average in EXACT integer arithmetic:
        # round(s/n/100, 4) as a double can land exactly on a decimal .5e-4
        # boundary (e.g. 88959/24/100 = 37.06625) where Spark's BigDecimal
        # rounding (shortest decimal repr) and a numeric engine's rounding
        # disagree by one ulp-digit. (200*|s| + n) div (2n) is the exact
        # half-AWAY-FROM-ZERO numerator in 1e-4 units; the sign is applied
        # after the magnitude rounds because Spark's `div` truncates toward
        # zero (a negative sum fed straight through would come out 1e-4
        # short of the round() behavior this replaces).
        .withColumn(
            "avg_value",
            F.expr(
                "CASE WHEN sum_value_cents < 0 THEN -1 ELSE 1 END"
                " * ((200 * abs(sum_value_cents) + n_events) div (2 * n_events))"
            )
            / 10000.0,
        )
    )
