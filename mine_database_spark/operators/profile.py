"""Single-scan table profiling — the data-quality census a pipeline runs
before trusting a new source (the Deequ/profiling tier of a training-data
stack): per column, row count, null count, distinct count, and typed
min/max, computed in ONE pass over the table.

Spark-first shape: every column's metrics are expressions inside a single
`df.agg(...)` — one scan, one (empty-key) aggregate whose partials combine
map-side; the per-column result row then unpivots to one output row per
column with an `explode(array(struct(...)))`, so nothing ever collects to
the driver and the output is an ordinary DataFrame a gate can join or
assert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _is_numeric(dtype: str) -> bool:
    """Numeric-branch test for typed min/max. decimal(p,s) dtypes carry a
    parameterized name, so membership in _NUMERIC alone would silently
    route them to the string branch — match the prefix explicitly."""
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile `columns` (default: all) of `df` in one scan.

    Returns one row per column:
      (col_name, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
       min_str, max_str)
    — numeric columns (integer/float/double and decimal(p,s)) carry
    min/max as DOUBLE in min_num/max_num (exact for integers below 2^53;
    decimals round to the nearest double) with the *_str pair NULL;
    everything else (string/boolean/date/timestamp) renders min/max as
    strings with the *_num pair NULL. Nulls are excluded from n_distinct and min/max,
    counted in n_nulls (SQL semantics on both counts).

    `exact_distinct=True` uses exact count(DISTINCT) — O(column
    cardinality) aggregation state per column, the audit form every
    profile oracle can replay. At 100 TB set False: approx_count_distinct
    (HyperLogLog++, rsd 5%) bounds state at a few KB per column and the
    rest of the profile is unchanged — same split as ngram_diversity vs
    its HLL twin.

    Scale: multiple DISTINCT aggregates compile to an Expand (each input
    row fans out once per distinct-column), so cost grows linearly with
    len(columns) — profile the columns you need, not SELECT *, when the
    table is wide. All aggregation is partial/map-side combinable; the
    unpivot runs on a single 1-row result.

    Plan shape (r15, guide §2.4): when exact distincts are mixed with a
    min/max over any NON-numeric column in one df.agg, the string-typed
    min/max buffers disqualify HashAggregate (UnsafeRow buffers must be
    mutable fixed-size) and no TypedImperativeAggregate is present to
    trigger ObjectHashAggregate — so EVERY phase of the Expand's distinct
    rewrite plans as SortAggregate, full sorts of the ×(len(cols)+1)
    expanded rows on both sides of the exchange (measured: the whole
    cost of the sf0.1 orders profile). Splitting the aggregation —
    count/nulls/min/max in one GLOBAL agg (grouping-free SortAggregate
    needs no Sort: it is a streaming fold), the exact distincts in their
    own Expand+HashAggregate (count buffers are all bigint — codegen,
    no sort) — removes every Sort from the plan for one extra
    column-pruned scan; the two 1-row results recombine with a trivial
    1×1 cross join. The combined single-scan form is kept whenever it is
    sort-free anyway (approx mode: HLL sketches are TypedImperative →
    ObjectHashAggregate; all-numeric profiles: every buffer is mutable →
    plain HashAggregate).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    plain_aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    distinct_aggs = []
    for c in cols:
        plain_aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nulls_{c}")
        )
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        distinct_aggs.append(nd.cast("bigint").alias(f"__nd_{c}"))
        if _is_numeric(dtypes[c]):
            plain_aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            plain_aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        else:
            plain_aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            plain_aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    split = exact_distinct and any(not _is_numeric(dtypes[c]) for c in cols)
    if split:
        row = df.agg(*plain_aggs).crossJoin(df.agg(*distinct_aggs))
    elif distinct_aggs:
        row = df.agg(*plain_aggs, *distinct_aggs)
    else:
        row = df.agg(*plain_aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        is_num = _is_numeric(dtypes[c])
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else null_d).alias("max_num"),
                (null_s if is_num else F.col(f"__min_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"__max_{c}")).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
