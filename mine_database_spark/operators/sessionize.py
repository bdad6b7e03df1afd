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


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time each
    stage completes IN ORDER — stage k counts only at the first event of
    type stages[k] strictly AFTER the user's stage-(k-1) completion (the
    standard product-analytics funnel; events before the prior stage do
    not count).

    Returns (user_col, t_<stage>... epoch-micros BIGINT with -1 for "never
    reached", n_stages INT = stages completed). Sentinel -1 instead of
    NULL keeps the value-hash compare total-ordered in both engines.

    Scale: ONE user-keyed aggregate per stage, all over the SAME
    hash-partitioning (each stage k is a conditional min over the same
    user key, so every exchange after the first reuses the clustering);
    no windows, no self-joins — per-user state is one timestamp per
    stage regardless of event volume.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    us = _micros(events, ts_col)
    e = events.select(
        F.col(user_col).alias("user_id"),
        us.alias("us"),
        F.col(type_col).alias("et"),
    )
    # stage 0: min ts of the first event type
    cur = e.where(F.col("et") == stages[0]).groupBy("user_id").agg(
        F.min("us").alias("t0")
    )
    for k, st in enumerate(stages[1:], start=1):
        nxt = (
            e.where(F.col("et") == st)
            .join(cur.select("user_id", F.col(f"t{k-1}").alias("__prev")), "user_id")
            .where(F.col("us") > F.col("__prev"))
            .groupBy("user_id")
            .agg(F.min("us").alias(f"t{k}"))
        )
        cur = cur.join(nxt, "user_id", "left")
    n_stages = F.lit(1)
    for k in range(1, len(stages)):
        n_stages = n_stages + F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
    return cur.select(
        "user_id",
        *[
            F.coalesce(F.col(f"t{k}"), F.lit(-1).cast("bigint")).alias(f"t_{st}")
            for k, st in enumerate(stages)
        ],
        n_stages.cast("int").alias("n_stages"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (cohort), counted in every later period they were active —
    the (cohort, offset) retention triangle every engagement dashboard
    draws, and for a training-data platform the freshness audit of a
    rolling crawl (how much of week-0's source set is still producing
    documents k weeks later).

    Period = floor(epoch_us / period_days·86400e6) — a fixed absolute
    grid (not user-relative), so period arithmetic is pure integer
    division. Returns (cohort_period BIGINT, period_offset INT,
    n_users BIGINT).

    Scale: distinct (user, period) activity + a per-user min — two
    map-side-combinable aggregates over the SAME user-keyed exchange —
    then one user-keyed equi-join and a final small (cohort, offset)
    rollup. Nothing wider than O(users · active periods) shuffles.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    us = _micros(events, ts_col)
    period_us = period_days * 86_400_000_000
    # integer floor division (epoch micros are non-negative)
    act = (
        events.select(F.col(user_col).alias("user_id"), us.alias("__us"))
        .select("user_id", F.expr(f"__us div {period_us}").alias("p"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("p").alias("cohort"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_period"),
            (F.col("p") - F.col("cohort")).cast("int").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def rate_anomaly(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_days: int = 1,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key event-rate anomaly flags: bucket counts per (key, period),
    then each bucket's z-score against ITS key's own mean/stddev across
    buckets — the ingest-health audit that catches a crawler retry storm,
    a source going dark, or a duplicated feed day before it pollutes a
    training snapshot.

    Determinism: mean and variance derive from INTEGER Σn and Σn² (both
    bigint, exact and order-insensitive) — var = (cnt·Σn² − (Σn)²) /
    cnt², computed as one float expression per row, never a float
    aggregation whose partition order could perturb the hash. Returns
    (key, period BIGINT, n, z rounded 4, is_anomaly) for every bucket;
    zero-variance keys get z = 0.

    Scale: one (key, period) count + one O(#keys) stats rollup joined
    broadcast — per-key state is two bigints regardless of event volume.
    Σn² caps the honest bucket count: ~3e9 events per bucket before the
    bigint square overflows; shard the period grid past that.
    """
    if bucket_days < 1:
        raise ValueError(f"bucket_days must be >= 1, got {bucket_days}")
    us = _micros(events, ts_col)
    bucket_us = bucket_days * 86_400_000_000
    per = (
        events.select(F.col(key_col).alias("key"), us.alias("__us"))
        .select("key", F.expr(f"__us div {bucket_us}").alias("period"))
        .groupBy("key", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    stats = per.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt"),
        F.sum("n").alias("__s1"),
        F.sum(F.col("n") * F.col("n")).alias("__s2"),
    )
    mean = F.col("__s1") / F.col("__cnt")
    var = (
        (F.col("__cnt") * F.col("__s2") - F.col("__s1") * F.col("__s1"))
        / (F.col("__cnt") * F.col("__cnt"))
    ).cast("double")
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    return per.join(F.broadcast(stats), "key").select(
        "key",
        "period",
        "n",
        F.round(z, 4).alias("z"),
        (F.abs(F.round(z, 4)) >= z_threshold).alias("is_anomaly"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    top_k: int = 20,
) -> DataFrame:
    """Top-k first-order Markov transitions between consecutive events of
    the same user: (from_type, to_type, n, p, rank) where p is the
    transition probability out of from_type — the behavioral summary
    behind funnel design, and for a pipeline the step-graph audit of a
    crawl scheduler's fetch→parse→store loop.

    Consecutive = lead() over (user, ts, id) — the id tiebreak makes
    simultaneous events deterministic. p = n / Σn per from_type, rounded
    6; global top-k orders by (n desc, from, to).

    Scale: one user-keyed window (the sort is per user, state one row) +
    a (from, to) count whose group count is at most |event types|² +
    a broadcast per-from total; top-k is a sort-limit, never a full sort.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    us = _micros(events, ts_col)
    w = Window.partitionBy("user_id").orderBy("__us", "__id")
    seq = events.select(
        F.col(user_col).alias("user_id"),
        us.alias("__us"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("from_type"),
    ).withColumn("to_type", F.lead("from_type").over(w))
    trans = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    top = (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
        )
        .orderBy(F.desc("n"), F.asc("from_type"), F.asc("to_type"))
        .limit(top_k)
    )
    rw = Window.orderBy(F.desc("n"), F.asc("from_type"), F.asc("to_type"))
    return top.withColumn("rank", F.row_number().over(rw).cast("int"))


def time_decayed_score(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    top_k: int = 100,
) -> DataFrame:
    """Recency-weighted activity score per key: each event contributes
    value · 2^(-b) where b = (age in days since the corpus's latest day)
    div half_life_days — the time-decayed ranking behind "which sources /
    users are active NOW" (a plain sum over-credits dead sources; a
    recency cutoff throws history away; exponential decay keeps both).

    The decay is a dyadic STEP function, deliberately: b is an exact
    integer, 2^b is an exact double for b <= 62, and dividing by it is a
    pure exponent shift — so each event's contribution floor(value·1e6 /
    2^b) is a deterministic bigint and the per-key score is an exact
    integer SUM, order-insensitive and replayable in any SQL engine (the
    embedding_outliers / adamic_adar quantization convention). A smooth
    2^(-Δt/h) would put an IEEE pow() ULP under a floor() — engines may
    disagree at the boundary. Ages past 62 half-lives clamp to weight 0.

    The age anchor is the GLOBAL max event day (one 1-row broadcast), so
    scores are "as of the latest data" and comparable across keys.

    Returns top_k rows (key, n_events, score_micro, score, rank) by
    (score_micro desc, key) — score = score_micro/1e6 rounded 6.

    Scale: one scan + a broadcast 1-row max + one key-grouped aggregate
    (map-side combinable, per-key state two bigints); top-k is a
    sort-limit (TakeOrdered). Overflow bound: Σ floor(value·1e6) per key
    must stay under 2^63 — ~9.2e12 value-units per key, documented like
    rate_anomaly's Σn² note.
    """
    if half_life_days < 1:
        raise ValueError(f"half_life_days must be >= 1, got {half_life_days}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    us = _micros(events, ts_col)
    day_us = 86_400_000_000
    base = events.select(
        F.col(key_col).alias("key"),
        us.alias("__us"),
        F.col(value_col).alias("__v"),
    ).select("key", F.expr(f"__us div {day_us}").alias("__day"), "__v")
    anchor = base.agg(F.max("__day").alias("__max_day"))
    b = F.least(
        F.expr(f"(__max_day - __day) div {int(half_life_days)}"), F.lit(62)
    )
    contrib = F.floor(
        (F.col("__v") * F.lit(1_000_000.0)) / F.pow(F.lit(2.0), b.cast("double"))
    ).cast("bigint")
    scored = (
        base.join(F.broadcast(anchor), how="cross")
        .select("key", contrib.alias("__c"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("__c").alias("score_micro"),
        )
    )
    top = scored.orderBy(F.desc("score_micro"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("key"))
    return top.select(
        "key",
        "n_events",
        "score_micro",
        F.round(F.col("score_micro") / 1_000_000.0, 6).alias("score"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def mad_anomaly(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_days: int = 1,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust twin of rate_anomaly: per-key bucket counts scored by the
    MODIFIED z-score 0.6745·(n − median)/MAD (Iglewicz–Hoaglin), where
    MAD is the median absolute deviation from the per-key median.

    Why a twin: mean/std have a 0% breakdown point — one huge retry
    storm inflates σ enough to score ITSELF under the z threshold (the
    masking effect; the planted pytest shows a 100× spike rate_anomaly
    scores at z≈2.2 that this operator scores at z≈445). Median/MAD
    break down only past 50% contamination, so the spike cannot hide.
    3.5 is the published modified-z cutoff.

    Determinism: bucket counts are exact integers; percentile() is the
    exact interpolated median, which on integers yields dyadic halves —
    both the median and MAD are exact doubles any engine reproduces
    (quantile_cont in DuckDB); z rounds to 4. MAD = 0 (over half the
    buckets identical) scores z = 0 — same convention as rate_anomaly's
    zero-variance keys.

    Returns (key, period, n, med, mad, z, is_anomaly) for every bucket.

    Scale: one (key, period) count, then two per-key EXACT percentile
    aggregates — state is O(buckets per key) (days in the window), NOT
    event volume; buckets join back broadcast since #keys·#periods is
    audit-sized. At an extreme period grid swap percentile for
    approx_percentile and declare the tolerance.
    """
    if bucket_days < 1:
        raise ValueError(f"bucket_days must be >= 1, got {bucket_days}")
    us = _micros(events, ts_col)
    bucket_us = bucket_days * 86_400_000_000
    per = (
        events.select(F.col(key_col).alias("key"), us.alias("__us"))
        .select("key", F.expr(f"__us div {bucket_us}").alias("period"))
        .groupBy("key", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    med = per.groupBy("key").agg(F.percentile("n", 0.5).alias("med"))
    withmed = per.join(F.broadcast(med), "key")
    mad = withmed.groupBy("key").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), 0.5).alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("n") - F.col("med")) / F.col("mad"),
    ).otherwise(F.lit(0.0))
    return withmed.join(F.broadcast(mad), "key").select(
        "key",
        "period",
        "n",
        "med",
        "mad",
        F.round(z, 4).alias("z"),
        (F.abs(F.round(z, 4)) >= z_threshold).alias("is_anomaly"),
    )
