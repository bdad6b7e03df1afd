"""Training-data shaping operators: context-window chunking, greedy sequence
packing, and temperature-weighted domain mixture sampling.

These extend the engine past the reference's own surface (SURVEY §2.13 —
LLM-data-pipeline extensions): a 100 TB pretraining pipeline tokenizes,
chunks, packs, and re-balances a corpus after the dedup/quality stages that
dedup.py / functions/text.py already provide.

Scale notes (the design constraints, in order):
  * chunk_documents is a pure scan→generate projection — ZERO shuffles, no
    Python; the chunk fan-out happens JVM-side via sequence()+posexplode so
    a 100 TB corpus chunks at full scan throughput.
  * pack_greedy is sequential *within a shard* by definition (bin state
    depends on every prior doc), so it runs as one applyInPandas per shard
    key — one hash exchange, state bounded by a shard's doc count, shards
    pack in parallel. This mirrors how production packers shard the corpus
    and pack each shard independently.
  * temperature_sample needs only a per-source count aggregate (tiny —
    O(#sources) rows, broadcast back) plus a stateless keep/drop scan; the
    keep decision is a deterministic md5-uniform so resampling is
    reproducible across runs and engines (no RNG seed plumbing).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mine_database_spark.functions.text import hex_uniform, token_count, tokens


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into fixed-size windows with a
    fixed stride (overlapping when stride < chunk_size) — the standard
    context-window chunking step before sequence packing.

    A document with n tokens (n > 0) yields ceil(max(n - chunk_size, 0) /
    stride) + 1 chunks; the last chunk clamps at the end of the document.
    Empty documents yield no chunks.

    Returns (id_col, chunk_idx, start_tok, n_toks, chunk_text).

    Scale: scan → project → posexplode. No shuffle, no Python — the token
    array, the start-offset sequence, and the slice/join all evaluate as
    Catalyst expressions, so chunking is embarrassingly parallel and runs at
    parquet scan speed regardless of corpus size.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError(f"chunk_size and stride must be >= 1, got {chunk_size}, {stride}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.greatest(F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))), F.lit(0))
        + F.lit(1)
    ).cast("int")
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("__k"),
    ).where(F.col("__n") > 0)
    start = F.col("chunk_idx").cast("bigint") * stride
    return (
        base.select(
            id_col,
            "__toks",
            "__n",
            F.posexplode(F.sequence(F.lit(0), F.col("__k") - 1)).alias("chunk_idx", "_v"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.alias("start_tok"),
            F.least(F.lit(chunk_size).cast("bigint"), F.col("__n") - start).alias("n_toks"),
            F.array_join(
                F.slice(F.col("__toks"), (start + 1).cast("int"), chunk_size), " "
            ).alias("chunk_text"),
        )
        # stride > chunk_size can put the ceil'd last start at exactly n
        # tokens — an empty window; never emit it
        .where(F.col("n_toks") > 0)
    )


def pack_walk(sizes: Iterable[int], capacity: int) -> list[int]:
    """The pure greedy next-fit walk pack_greedy runs per shard: append to
    the current bin unless it would exceed `capacity`, else open a new bin;
    the first item always seeds bin 0 (even when oversize). Exposed at
    module level so property tests can pin the kernel without Spark."""
    bins, bin_id, fill, first = [], 0, 0, True
    for n in sizes:
        if first:
            fill, first = n, False
        elif fill + n <= capacity:
            fill += n
        else:
            bin_id += 1
            fill = n
        bins.append(bin_id)
    return bins


def chunk_starts(n: int, chunk_size: int, stride: int) -> list[int]:
    """The start offsets chunk_documents generates for an n-token document —
    the same ceil((n - chunk_size)/stride)+1 arithmetic, as pure Python for
    property tests. Empty documents yield no chunks."""
    if n <= 0:
        return []
    import math

    k = max(math.ceil((n - chunk_size) / stride), 0) + 1
    # stride > chunk_size can push the ceil'd last start to exactly n
    # (an empty window); drop it, mirroring the operator's n_toks > 0 guard
    return [i * stride for i in range(k) if i * stride < n]


def pack_greedy(
    docs: DataFrame,
    capacity: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy next-fit sequence packing: within each shard, walk documents
    in id order and append each to the current bin unless it would overflow
    `capacity` tokens, in which case open a new bin. A document longer than
    capacity gets a bin of its own (and the next document opens a fresh one).

    Returns (shard_col, id_col, n_toks, bin_id) — bin ids are 0-based per
    shard.

    Scale: packing is inherently sequential in the scan order (each bin
    decision depends on the running fill), so global packing cannot
    distribute. The production answer — and this implementation — is
    per-shard packing: one hash exchange on shard_col, then an Arrow-batched
    applyInPandas walks each shard independently. State is O(1) per shard
    (the running fill); shards pack in parallel across executors. The token
    count is computed JVM-side *before* the exchange so Python never touches
    document text.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    sized = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc"),
        token_count(F.col(text_col)).cast("bigint").alias("n_toks"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc", kind="mergesort").reset_index(drop=True)
        pdf["bin_id"] = pd.Series(
            pack_walk([int(n) for n in pdf["n_toks"]], capacity), dtype="int64"
        )
        return pdf

    # output schema derives from the input: shard/doc keep their real types
    # (an int shard key or string doc ids must not be coerced)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(sized.schema.fields) + [T.StructField("bin_id", T.LongType())]
    )
    packed = sized.groupBy("shard").applyInPandas(pack, schema=out_schema)
    return packed.select(
        F.col("shard").alias(shard_col),
        F.col("doc").alias(id_col),
        "n_toks",
        "bin_id",
    )


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str | Column],
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running total of `value_col` in `order_cols` order,
    WITHOUT the single-partition global sort a plain
    `Window.orderBy(...)` (no partitionBy) compiles to.

    Classic two-level distributed prefix sum, expressed entirely in
    DataFrame ops:

      1. `repartitionByRange(order_cols)` range-partitions the rows so
         partition i holds a contiguous slice of the total order (partition
         ids ascend with the range boundaries).
      2. A window PARTITIONED BY the physical partition id computes each
         row's local running total — every partition sorts and scans
         independently, in parallel.
      3. A per-partition total aggregate (O(#partitions) rows) is turned
         into exclusive offsets with a tiny single-partition window and
         broadcast back; global cum = local cum + partition offset.

    Correctness requires both branches of the __pid join (the
    running-total rows and the per-partition offsets) to read the SAME
    physical shuffle: RangePartitioner samples boundaries
    nondeterministically, so two independently-materialized range
    exchanges could split the order differently and mix partitions in
    the __pid join. ReuseExchange collapses the branches into one
    shuffle whenever their exchange subtrees canonicalize identically.
    The offsets aggregate folds `max_by(__local, __rn)` — the running
    total at the last row of each partition, i.e. the exact partition
    total for any value sign — consuming WINDOW OUTPUTS of the same
    ordered window. The offsets subtree therefore contains the rows
    branch's whole window: the exchange children (order columns
    included) are identical by construction under any column-pruning
    outcome, AND the shared subtree extends through the __pid hash
    exchange, so `spark_partition_id()` is physically evaluated ONCE —
    both branches read one set of partition ids from one shuffle.

    Deliberate cost, measured and accepted: the offsets branch
    re-evaluates the partition-local sort+window above the reused
    exchanges (+35% on token_shards at sf0.1, where the kernel is a
    large fraction; at scale the corpus scan dominates and the kernel
    projection is tens of bytes/row). The tempting alternative —
    aggregating `sum(val)` over the PRE-window exchange output — was
    built, measured (-35%), and REJECTED: its offsets branch takes its
    own AQEShuffleRead of the range stage and evaluates
    spark_partition_id() a second time, so correctness would rest on
    AQE always coalescing two sibling reads of one exchange to
    identical specs — a strictly subtler invariant than the exchange
    reuse itself. tests/test_plans.py pins exactly one materialized
    range exchange in the executed adaptive plan, so any engine change
    that stopped reusing it fails loudly rather than corrupting sums.
    When the caller's frame carries payload columns, the cum is computed
    on the narrow kernel and hash-joined back on order_cols — which must
    be a TOTAL order (include a unique tiebreak column). This is not just
    the usual ambiguous-split caveat: on a violation the join-back
    MULTIPLIES rows — every payload row carrying a duplicated key matches
    every kernel row with that key, so the output has MORE rows than the
    input (n² per duplicated key), corrupting downstream counts, not
    merely the cum values. All registry callers order by a unique id; a
    new caller that cannot guarantee uniqueness must append a tiebreak
    column (e.g. a content hash) to order_cols first.

    `value_col` sums in its own type family: integral columns accumulate
    as bigint, fractional ones as their native type (no silent truncation
    of weights).

    Scale: one range shuffle of the kernel projection + one broadcast of
    #partitions offset rows (+ one hash join back when payload columns
    exist). The only single-partition step touches O(#partitions) rows,
    never the data. This is the building block for global-order
    assignments (shard ids, curriculum positions, global ranks) that
    naive global windows make un-runnable at 100 TB.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    str_order = [c for c in order_cols if isinstance(c, str)]
    all_str = len(str_order) == len(list(order_cols))
    integral = isinstance(
        df.schema[value_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )
    val = F.col(value_col).cast("bigint") if integral else F.col(value_col)

    # narrow kernel: only the columns the prefix sum itself needs. With
    # expression order cols (e.g. col("v").desc()) the referenced source
    # columns can't be identified generically, so those calls keep the
    # legacy inline shape — fine for the narrow frames they're used with,
    # and the exchange-reuse guarantee below still holds when nothing
    # beyond value+order exists to prune.
    payload = [] if not all_str else [
        c for c in df.columns if c != value_col and c not in str_order
    ]
    can_inline = not payload
    kernel_in = df if can_inline else df.select(value_col, *str_order)

    part = (
        kernel_in.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else kernel_in.repartitionByRange(*cols)
    ).withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # __rn: row position within the same ordered window. max_by(__local,
    # __rn) below is the running total at the partition's LAST row — the
    # exact partition total for ANY value sign — and deriving it from the
    # window's own outputs (not a pre-window re-aggregate) is what buys
    # the two structural guarantees in the docstring: exchange-children
    # identity under any pruning, and a single physical evaluation of
    # spark_partition_id().
    local = part.withColumn("__local", F.sum(val).over(w_local)).withColumn(
        "__rn", F.row_number().over(Window.partitionBy("__pid").orderBy(*cols))
    )
    # exclusive prefix of per-partition totals: O(#partitions) rows only
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.max_by("__local", "__rn").alias("__ptot"))
        .select(
            "__pid",
            F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    out_cum = F.col("__local") + F.col("__off")
    kernel = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(cum_col, out_cum.cast("bigint") if integral else out_cum)
        .drop("__pid", "__local", "__rn", "__off")
    )
    if can_inline:
        return kernel
    # null-safe equality: a plain equi-join would silently DROP rows whose
    # order columns hold NULL (the kernel still ranks them — range
    # partitioning orders NULLs first)
    k = kernel.select(
        *[F.col(c).alias(f"__k_{c}") for c in str_order], cum_col
    )
    cond = None
    for c in str_order:
        piece = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = piece if cond is None else cond & piece
    return df.join(k, cond).drop(*[f"__k_{c}" for c in str_order])


def token_budget_shards(
    docs: DataFrame,
    budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-token-budget output shard in
    longest-first curriculum order: walk documents by (n_toks DESC, id),
    accumulate token counts, and start a new shard each time the running
    total crosses a `budget` boundary — shard_id = (cum - n_toks) DIV
    budget. Every shard except the last holds >= budget tokens' worth of
    start positions; a document always lands in the shard its first token
    falls in, so shard sizes are balanced to within one document.

    Returns (id_col, n_toks, cum_toks, shard_id).

    Scale: token counts are a JVM regexp scan; the global running total is
    distributed_prefix_sum — one range shuffle, parallel per-partition
    windows, a broadcast of O(#partitions) offsets. No single-partition
    sort of the corpus anywhere, so the assignment runs at shuffle speed
    on a 1000-executor cluster.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    sized = docs.select(
        F.col(id_col), token_count(F.col(text_col)).cast("bigint").alias("n_toks")
    )
    cum = distributed_prefix_sum(
        sized, "n_toks", [F.col("n_toks").desc(), F.col(id_col).asc()], cum_col="cum_toks"
    )
    return cum.select(
        id_col,
        "n_toks",
        "cum_toks",
        F.expr(f"(cum_toks - n_toks) div {int(budget)}").cast("bigint").alias("shard_id"),
    )


def shard_balance(sharded: DataFrame, budget: int) -> DataFrame:
    """Balance audit over a `token_budget_shards` assignment: per shard,
    doc count, token sum, fill ratio vs the budget, and an over-budget
    flag — the data-loader throughput check (one oversized shard is the
    straggler that idles every other reader in the epoch; systematic
    under-fill means the budget is mis-sized vs the document length
    distribution).

    A shard legitimately exceeds `budget` when a single document does —
    the assignment never splits documents — so `over_budget` marks
    shards to route through a doc-splitting pass, not errors. Returns
    (shard_id, n_docs, shard_tokens, fill_ratio rounded 6, over_budget).

    Scale: ONE map-side-combinable aggregate over the assignment — the
    audit costs a single shuffle of O(shards) rows.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").alias("shard_tokens"),
        )
        .select(
            "shard_id",
            "n_docs",
            "shard_tokens",
            F.round(F.col("shard_tokens") / F.lit(float(budget)), 6).alias(
                "fill_ratio"
            ),
            (F.col("shard_tokens") > budget).alias("over_budget"),
        )
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted domain re-balancing: sample each source s with
    probability p_s = min(1, (N * N_s^alpha / sum_t N_t^alpha) / N_s), the
    keep-rate that reshapes the corpus toward the alpha-tempered source
    distribution (alpha=1 keeps everything; alpha→0 equalizes sources).
    The keep decision is hex_uniform(doc_id) < p_s — deterministic,
    engine-reproducible, no RNG state.

    Returns the kept (id_col, source_col, keep_prob[rounded 6]).

    Scale: the per-source histogram is O(#sources) rows — computed with one
    map-side-combinable groupBy, then broadcast back onto the scan. The
    keep/drop pass itself is stateless and shuffle-free, so the operator
    costs one tiny aggregate plus one corpus scan at 100 TB.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    hist = docs.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).cast("double").alias("__ns")
    )
    tot = hist.agg(
        F.sum("__ns").alias("__n"), F.sum(F.pow("__ns", F.lit(alpha))).alias("__wsum")
    )
    rates = hist.crossJoin(F.broadcast(tot)).select(
        "__src",
        F.least(
            F.lit(1.0),
            F.col("__n") * F.pow("__ns", F.lit(alpha)) / F.col("__wsum") / F.col("__ns"),
        ).alias("__p"),
    )
    return (
        docs.join(F.broadcast(rates), docs[source_col] == F.col("__src"))
        .where(hex_uniform(F.col(id_col)) < F.col("__p"))
        .select(id_col, source_col, F.round(F.col("__p"), 6).alias("keep_prob"))
    )


def distributed_rank(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number over a total order, without the
    single-partition sort `row_number() OVER (ORDER BY ...)` compiles to —
    just distributed_prefix_sum over a constant 1."""
    out = distributed_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        "__one",
        order_cols,
        cum_col=rank_col,
        num_partitions=num_partitions,
    )
    return out.drop("__one")


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence[str | Column],
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL NTILE(n) semantics at scale: with T rows, the first
    T % n buckets hold T div n + 1 rows, the rest T div n — identical
    values to `ntile(n) OVER (ORDER BY ...)`, computed from the
    distributed rank plus one broadcast row count instead of a global
    single-partition window.

    Scale: distributed_rank's range shuffle + a broadcast 1-row count —
    the pattern for any global-order assignment (percentile buckets,
    train/val/test splits, curriculum deciles) over an arbitrarily large
    table.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ranked = distributed_rank(df, order_cols, rank_col="__rank", num_partitions=num_partitions)
    total = df.select(F.count(F.lit(1)).cast("bigint").alias("__t"))
    # exact integer arithmetic throughout (DIV, not double division — a
    # double floor can mis-round for T near 2^50+): size = T div n, the
    # first `extra` buckets hold size+1 rows. greatest() keeps the dead
    # branch div-safe when size == 0 (T < n: cut == T, so every row takes
    # the first branch).
    return (
        ranked.join(F.broadcast(total), how="cross")
        .withColumn("__size", F.expr(f"__t DIV {int(n)}"))
        .withColumn("__cut", F.expr(f"(__t % {int(n)}) * (__size + 1)"))
        .withColumn(
            out_col,
            F.expr(
                f"CAST(CASE WHEN __rank <= __cut THEN (__rank - 1) DIV (__size + 1) "
                f"ELSE (__t % {int(n)}) + (__rank - __cut - 1) DIV greatest(__size, 1L) "
                f"END + 1 AS INT)"
            ),
        )
        .drop("__rank", "__t", "__size", "__cut")
    )


def assign_splits(
    docs: DataFrame,
    weights: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic dataset split assignment: each document lands in the
    split whose cumulative-weight interval contains hex_uniform(salt‖id).
    Hash-based (not random) so the assignment is stable across runs,
    engines, partitionings, and corpus growth — adding documents never
    moves an existing document's split, the property a training pipeline
    needs for resumable preprocessing.

    Returns docs + a `split` column. `salt` derives independent splits
    from the same ids (e.g. per-epoch holdouts).

    Scale: one stateless scan — no shuffle, no count, no Python.
    """
    total = sum(w for _, w in weights)
    if not weights or total <= 0 or any(w < 0 for _, w in weights):
        raise ValueError(f"weights must be nonnegative with positive sum, got {weights!r}")
    u = hex_uniform(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # CASE built left-to-right (first matching cumulative interval wins);
    # the last split is the otherwise-branch so u ~ 1.0 is always covered
    acc = 0.0
    expr = None
    for name, w in weights[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    split = expr.otherwise(F.lit(weights[-1][0])) if expr is not None else F.lit(weights[-1][0])
    return docs.withColumn("split", split)


def pack_concat(
    docs: DataFrame,
    capacity: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Materialize pack_greedy's bins: per (shard, bin), the documents'
    texts concatenated in walk order (id order) with `sep` — the actual
    training-sequence payload — plus the token total and document count.

    Returns (shard_col, bin_id, n_docs, n_toks, packed_text).

    Scale: pack_greedy's single shard exchange, then one (shard, bin)
    aggregation; the text concat happens in the aggregate (collect_list of
    (id, text) structs, array_sort, join) so no per-document rows survive
    the shuffle boundary. Bins are capacity-bounded, so per-group state is
    bounded by construction — collect_list here cannot blow up the way an
    unbounded group would.
    """
    bins = pack_greedy(docs, capacity, shard_col, id_col, text_col).select(
        F.col(shard_col).alias("__shard"), F.col(id_col).alias("__doc"), "n_toks", "bin_id"
    )
    joined = docs.select(
        F.col(shard_col).alias("__shard"), F.col(id_col).alias("__doc"), F.col(text_col).alias("__text")
    ).join(bins, ["__shard", "__doc"])
    return (
        joined.groupBy("__shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_toks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("__doc"), F.col("__text")))),
                    lambda s: s["__text"],
                ),
                sep,
            ).alias("packed_text"),
        )
        .select(
            F.col("__shard").alias(shard_col), "bin_id", "n_docs", "n_toks", "packed_text"
        )
    )


def mixture_upsample(
    docs: DataFrame,
    factors: "dict[str, float]",
    default_factor: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Epochs-per-source corpus mixing — the UPSAMPLING half that
    temperature_sample (keep-rates ≤ 1) cannot express: a training mix like
    "3.5 epochs of wiki, 0.8 of crawl" emits each document
    floor(f) + Bernoulli(frac(f)) times, where the Bernoulli draw is the
    deterministic hex_uniform(id) — so expected copies equal the factor
    exactly, re-runs reproduce bit-identically, and adding documents never
    flips an existing one's count.

    Returns (id_col, source_col, epoch, n_copies) with epoch 1..n_copies —
    one output row per emitted copy, ready to union into the shard stream
    (downstream packing sees each epoch as its own row; a consumer needing
    distinct shuffling per epoch can fold `epoch` into its sort key).
    Factors < 1 behave like a keep-rate (0 or 1 copies); unmapped and NULL
    sources take `default_factor`.

    Scale: the factor map is an inline literal MAP expression and the copy
    count is a stateless scan-side formula — no aggregate, no shuffle, no
    join anywhere. The explode fans out ≤ ceil(max factor) rows per doc at
    parquet scan speed (Spark's Generate), so the operator's cost is the
    output volume itself.
    """
    from mine_database_spark.functions.text import hex_uniform

    if any(f < 0 for f in factors.values()) or default_factor < 0:
        raise ValueError("repetition factors must be >= 0")
    if factors:
        kv = []
        for s, f in factors.items():
            kv.extend([F.lit(s), F.lit(float(f))])
        fac = F.coalesce(
            F.try_element_at(F.create_map(*kv), F.col(source_col).cast("string")),
            F.lit(float(default_factor)),
        )
    else:
        fac = F.lit(float(default_factor))
    n = (
        F.floor(fac)
        + F.when(hex_uniform(F.col(id_col)) < fac - F.floor(fac), 1).otherwise(0)
    ).cast("int")
    return (
        docs.select(F.col(id_col), F.col(source_col), n.alias("n_copies"))
        .where(F.col("n_copies") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("epoch"),
            "n_copies",
        )
    )


def stratified_cap_sample(
    df: DataFrame,
    cap: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-budget subsample: keep EXACTLY min(cap, |s|)
    rows per stratum, chosen by hash order — the "N documents per domain"
    curation rule, where temperature_sample's rate form can only hit a
    budget in expectation. hex_uniform(id) orders each stratum uniformly
    at random but reproducibly: re-running (or re-running on a grown
    corpus) never swaps a kept row for an unkept one unless new rows
    hash earlier.

    Returns (id_col, stratum_col, pick) with pick the 1-based selection
    order within the stratum.

    Scale: ONE hash exchange on the stratum key; the rank filter is a
    running-window top-N that Spark 3.5's WindowGroupLimit rewrites into
    per-partition partial limits BEFORE the shuffle, so a hot stratum
    ships at most cap·n_map_partitions rows, not its full population.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(stratum_col).orderBy(
        hex_uniform(F.col(id_col)), F.col(id_col)
    )
    return (
        df.select(id_col, stratum_col)
        .withColumn("pick", F.row_number().over(w).cast("bigint"))
        .where(F.col("pick") <= cap)
    )
