"""Deterministic streaming-sketch operators: Count-Min frequency
estimation, HyperLogLog cardinality estimation, and log2-histogram
quantile estimation.

At 100 TB, exact frequency/cardinality/quantile answers need corpus-wide
shuffles whose state is O(distinct items); these sketches bound the state
to a few KB regardless of scale. All are built DETERMINISTICALLY
(md5-derived hashing, and every order-sensitive accumulation kept in
INTEGER domain so partition order cannot perturb the result) — which is
what lets even the approximate answers carry full DuckDB value oracles,
the repo's standing bar for "done" (same bar as bloom_decontaminate,
dedup.py).

Reference context: the reference has no sketch machinery (its censuses are
exact Mongo counts, pickaxe.py:1218-1221); these extend the audit family
(corpus_stats, dedup_report, key_skew) with the constant-memory forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _h2pair(col, salt: str):
    """Two independent 60-bit md5 hashes (h2 forced odd) — the same
    Kirsch–Mitzenmacher double-hashing base as bloom_decontaminate."""
    h1 = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    h2 = (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 15), 16, 10)
        .cast("bigint")
        .bitwiseOR(F.lit(1))
    )
    return h1, h2


def cms_table(
    items: DataFrame,
    col: str,
    d: int = 4,
    w: int = 8192,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch as a (row, col, c) cell table: every item
    increments one counter per hash row; an item's estimate is the MIN of
    its d counters — never an underestimate (one-sided error, overestimate
    bounded by ~2N/w per row with probability 1-2^-d).

    `weight_col` (integer) makes each row increment its d counters by that
    weight instead of 1 — so a pre-aggregated (item, count) table builds
    the IDENTICAL cell table as the raw stream (c(row,col) = Σ over items
    hashed there of their occurrence counts, whether summed row-by-row or
    from the per-item totals; integer sums, order-independent). A caller
    that already holds exact per-item counts hashes each DISTINCT item
    once instead of once per occurrence and feeds the sketch build from
    the small aggregate rather than a second pass over the corpus
    (pinned equal by pytest; q_cms_token_freq's r15 shape).

    weight_col CONTRACT (r15 ADVICE): weights must be NON-NULL POSITIVE
    integers — occurrence counts. F.sum skips NULLs (a cell whose every
    weight is NULL comes out NULL, not 0), and a zero/negative weight
    breaks the documented one-sided-error guarantee above (an estimate
    could then UNDERCOUNT). The raw-stream form (weight_col=None) is the
    safe default for anything that is not an exact count aggregate; this
    operator does not scan-validate the column because the check would
    cost a full pass over what is by contract a small aggregate — callers
    feeding untrusted weights must validate upstream.

    Scale: the aggregate is map-side combinable and its state is at most
    d·w cells (~32k rows at the default) NO MATTER how many items flow in
    — the constant-memory twin of an exact groupBy(item) whose state is
    O(distinct items). The cell table broadcasts anywhere.
    """
    if d < 1 or d > 7:
        raise ValueError(f"d must be in [1, 7], got {d}")
    h1, h2 = _h2pair(F.col(col), salt)
    pos = F.posexplode(
        F.array(*[F.pmod(h1 + i * h2, F.lit(w)) for i in range(d)])
    ).alias("row", "col")
    if weight_col is None:
        cells = items.select(pos)
        agg = F.count(F.lit(1))
    else:
        cells = items.select(F.col(weight_col).alias("__w"), pos)
        agg = F.sum("__w")
    return cells.groupBy("row", "col").agg(agg.cast("bigint").alias("c"))


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    col: str,
    d: int = 4,
    w: int = 8192,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for `probes[col]` against a cms_table:
    est = min over the d addressed counters (0 if a cell is absent —
    only possible when the item truly never occurred).

    Scale: probes fan out d rows each and equi-join the broadcastable
    cell table — O(|probes|·d) work, independent of the stream size the
    sketch absorbed.
    """
    h1, h2 = _h2pair(F.col(col), salt)
    addr = probes.select(
        col,
        F.posexplode(
            F.array(*[F.pmod(h1 + i * h2, F.lit(w)) for i in range(d)])
        ).alias("row", "col_idx"),
    )
    joined = addr.join(
        F.broadcast(cms.withColumnRenamed("col", "col_idx")),
        ["row", "col_idx"],
        "left",
    )
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0).cast("bigint"))).alias("est_n")
    )


# HyperLogLog constants: m = 1024 buckets (b = 10 index bits out of the
# 60-bit md5 value; the remaining 50 bits feed the rank). alpha_m per the
# original Flajolet et al. 2007 formula, precomputed so both engines parse
# the identical double literal.
HLL_M = 1024
HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M  # ≈ 755780.3
_POW2_51 = float(1 << 51)


def hll_registers(
    items: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog registers per group: bucket = top 10 bits of the 60-bit
    md5 value, rho = leading-zero count of the low 50 bits + 1 (computed
    EXACTLY via length(bin(x)) — no float log), register = max rho.

    Scale: one map-side-combinable max-aggregate whose state is ≤ 1024
    registers per group — the constant-memory twin of count_distinct,
    whose exact state is O(distinct values).
    """
    g = group_cols or []
    bucket, rho = hll_bucket_rho(F.col(col), salt)
    return (
        items.select(*g, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_bucket_rho(col, salt: str = "hll"):
    """The (bucket, rho) expression pair behind hll_registers, exposed so
    composed operators (ngram_diversity_hll's single-scan production
    form) can fold the register derivation into their own aggregation."""
    v = F.conv(F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 15), 16, 10).cast(
        "bigint"
    )
    # integer shift, not double division: v is up to 2^60-1, which a
    # 53-bit double mantissa cannot hold exactly — values within ~64 of a
    # 2^50 boundary would round into the NEXT bucket (~2^-44/row, latent),
    # diverging from the oracle's exact integer `//`
    bucket = F.shiftright(v, 50)
    rest = F.pmod(v, F.lit(1 << 50))
    rho = F.when(rest == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.bin(rest))
    ).cast("int")
    return bucket, rho


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cardinality estimate from hll_registers, returned as
    (group_cols..., est_distinct DOUBLE rounded 2).

    Determinism: the harmonic denominator Σ 2^-M_j is accumulated as the
    INTEGER Σ 2^(51-M_j) (each term ≤ 2^51, 1024 terms < 2^62 — no
    overflow), so the order-sensitive float summation that would break
    engine/partition reproducibility never happens; the only float ops
    are one division and (in the small-range branch) one ln, identical
    in both engines. Flajolet's small-range correction applies below
    2.5·m when empty buckets remain: E = m·ln(m/V0).
    """
    g = group_cols or []
    agg = registers.groupBy(*g).agg(
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.lit(51) - F.col("m_j")).cast("int")
            )
        ).alias("__num_present"),
        F.count(F.lit(1)).alias("__v_present"),
    )
    # absent buckets contribute 2^(51-0) each to the integer numerator
    num = F.col("__num_present") + (F.lit(HLL_M) - F.col("__v_present")) * F.lit(1 << 51)
    raw = F.lit(HLL_ALPHA_M2) * F.lit(_POW2_51) / num
    v0 = (F.lit(HLL_M) - F.col("__v_present")).cast("double")
    small = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v0)
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v0 > 0), small).otherwise(raw)
    return agg.select(*g, F.round(est, 2).alias("est_distinct"))


def hist_quantiles(
    df: DataFrame,
    col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
    group_cols: list[str] | None = None,
    n_bins: int = 62,
) -> DataFrame:
    """Constant-memory quantile estimates for a non-negative integer
    metric via a log2-bucketed histogram: bin = bit_length(v+1) - 1
    (EXACT integer arithmetic — length(bin(x)), the HLL-rho idiom, never
    a float log whose boundary rounding differs across engines), and the
    p-th percentile reports the smallest bin whose cumulative count
    covers p% (upper bound 2^(bin+1) - 1 as the value estimate).

    The selection threshold is the integer comparison cum·100 >= pct·total
    — no float multiply, no ceil, no engine disagreement at exact-boundary
    percentiles (the round-6 tumbling_window lesson). Returns
    (group..., pct INT, bin INT, est_hi BIGINT) per requested percentile.

    This is the sketch-tier twin of percentile_filter's exact
    percentile(): state is <= n_bins counters per group FOREVER (vs the
    exact form's O(distinct values) sort buffer) at log2-bin resolution —
    the right audit for "how long are documents per source" at 100 TB,
    where half-order-of-magnitude precision is plenty.

    Scale: one map-side-combinable (group, bin) count; the cumulative
    walk runs over O(groups · n_bins) rows. Negative values raise (the
    bin function is undefined there); clamp or shift upstream.
    """
    counts = hist_bin_counts(df, col, group_cols=group_cols, n_bins=n_bins)
    return hist_quantiles_from_counts(counts, pcts=pcts, group_cols=group_cols)


def hist_bin_counts(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 62,
) -> DataFrame:
    """The (group..., bin, n) register half of hist_quantiles: one
    map-side-combinable count per log2 bucket, <= n_bins counters per
    group forever. Split out because this SAME shape is the streaming
    twin (streaming.windows.stream_hist_counts) — a native streaming
    count aggregation; hist_quantiles_from_counts serves either form."""
    if not 1 <= n_bins <= 62:
        raise ValueError(f"n_bins must be in [1, 62], got {n_bins}")
    g = group_cols or []
    v = F.col(col).cast("bigint")
    # the negative guard lives INSIDE the bin expression — a separate
    # guard column would be column-pruned away and never evaluate
    bin_expr = F.least(F.lit(n_bins - 1), F.length(F.bin(v + 1)) - F.lit(1))
    binned = df.select(
        *g,
        F.when(v < 0, F.raise_error(f"hist_quantiles: negative {col}").cast("bigint"))
        .otherwise(bin_expr)
        .cast("int")
        .alias("bin"),
    )
    return binned.groupBy(*g, "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def hist_quantiles_from_counts(
    counts: DataFrame,
    pcts: tuple[int, ...] = (50, 90, 99),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile selection over a (group..., bin, n) register table (batch
    OR materialized streaming registers): integer cum·100 >= pct·total
    walk over O(groups · n_bins) rows."""
    if not pcts or any(not 1 <= p <= 100 for p in pcts):
        raise ValueError(f"pcts must be ints in [1, 100], got {pcts}")
    g = group_cols or []
    wcum = Window.partitionBy(*g).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy(*g)
    cum = counts.select(
        *g, "bin", F.sum("n").over(wcum).alias("cum"), F.sum("n").over(wtot).alias("tot")
    )
    p = F.explode(F.array(*[F.lit(int(x)) for x in sorted(set(pcts))])).alias("pct")
    hit = cum.select(*g, "bin", "cum", "tot", p).where(
        F.col("cum") * 100 >= F.col("pct") * F.col("tot")
    )
    sel = hit.groupBy(*g, "pct").agg(F.min("bin").alias("bin"))
    est = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (F.col("bin") + 1).cast("int")
    ) - F.lit(1)
    return sel.select(*g, "pct", "bin", est.alias("est_hi"))
