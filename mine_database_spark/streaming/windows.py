"""Structured Streaming wrappers (SURVEY §2.11).

The reference is batch-only; these extend the engine with the streaming
forms of its incremental units: tumbling/session window aggregation over an
event stream, and foreachBatch peak annotation (peak matching is
embarrassingly incremental — each micro-batch of peaks joins the static
compound dimension independently).

All logic is shared with the batch operators — the streaming functions only
swap the source/sink and add watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """groupBy(window(ts), type) with a watermark for late data — the
    streaming form of sessionize.tumbling_window_agg."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("sum_value_cents"),
        )
    )


def stream_session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows via session_window() — the streaming
    equivalent of the gap-based batch sessionizer."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each left event pairs with
    right events of the same key whose timestamp falls in
    [left.ts - lookback, left.ts] — the streaming form of the as-of/interval
    enrichment (operators/asof.py is the batch form).

    State sizing at scale: BOTH sides carry a watermark and the join
    condition bounds right.ts relative to left.ts, so the state store
    retains only `watermark + lookback` of history per side, partitioned by
    the join key across executors (RocksDB state backend for large keys).
    An unbounded stream-stream join without the time bound would grow state
    forever — never ship that shape.
    """
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}"))
    )
    return lw.join(rw, cond, "inner")


def stream_contamination(
    doc_stream: DataFrame,
    train_shingles: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming decontamination: incoming docs are scored against a STATIC
    train shingle set (one column `shingle`) as they arrive — the
    stream-static join pattern (no state, no watermark; each doc's result
    is final on arrival). Emits (doc_id, n_shingles, n_shared,
    contamination_rate) in update mode via the per-doc aggregation.

    Scale: the batch side explodes per-doc-distinct shingles inside the
    row (same one-pass extractor as the batch query); the static side is a
    plain DataFrame, so Spark plans a regular join per micro-batch with
    all the usual strategies (broadcast if small, shuffle if not).
    """
    from mine_database_spark.functions.text import word_shingle_strings

    sh = doc_stream.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingle_strings(F.col(text_col), k))).alias("shingle"),
    )
    t = train_shingles.select("shingle").distinct().withColumn("__hit", F.lit(1))
    joined = sh.join(t, "shingle", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("contamination_rate"),
        )
    )


def annotate_peaks_foreach_batch(core_compounds: DataFrame, adducts: DataFrame, tolerance: float = 0.001):
    """Returns a foreachBatch function that annotates each micro-batch of
    peaks against the static compound dimension (SURVEY §2.11: J2 is
    per-peak independent, so incremental execution is exact)."""
    from mine_database_spark.operators.metabolomics import find_db_hits

    def process(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return find_db_hits(batch_df, adducts, core_compounds, tolerance)

    return process


def stream_incremental_dedup(
    doc_stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_text_col: str = "text",
) -> DataFrame:
    """Streaming cross-batch dedup: arriving docs pass through only when
    their text digest is NOT in the STATIC historical corpus — the
    stream-static left-anti twin of operators/dedup.py:incremental_dedup
    (each doc's verdict is final on arrival: no state, no watermark).

    No TTL knob, deliberately: unlike exact_dedup_stream (whose
    per-digest state store grows with the stream and is bounded by
    `state_ttl_minutes`), a stream-static anti-join holds NO state store
    at all — the static side re-resolves per micro-batch and each batch
    plans an ordinary join. The memory to bound lives on the STATIC side
    (the digest projection / persisted bucket-digest artifact), which is
    the caller's storage, not stream state. Statelessness is pinned by
    test_stream_incremental_dedup (zero stateOperators in progress).

    Within-stream duplicates are a separate concern — chain
    streaming/stateful.py:exact_dedup_stream after this for both.

    Scale: the static side reduces to a digest-only projection, so each
    micro-batch plans a regular anti-join with the usual strategies
    (broadcast when the digest set is small; for a 100 TB corpus, point the
    static side at the persisted bucket-digest artifact instead and let the
    two-phase batch form handle the verify pass).

    Emits (id_col, digest) per surviving doc in append mode.
    """
    digests = corpus.select(F.md5(F.col(corpus_text_col)).alias("digest")).distinct()
    return doc_stream.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    ).join(digests, "digest", "left_anti")


def stream_exact_dedup_watermarked(
    docs: DataFrame,
    ts_col: str = "ts",
    delay: str = "10 minutes",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Event-time streaming exact dedup using Spark's BUILT-IN
    dropDuplicatesWithinWatermark — the native twin of
    stateful.exact_dedup_stream, per the engine's prefer-built-ins
    doctrine. The first-arriving row per md5(text) digest survives; later
    copies within the watermark window drop; state for a digest is evicted
    once the watermark passes its event time + delay, so a duplicate
    arriving later than `delay` after the original re-admits as new —
    the same bounded-window tradeoff as the custom operator's TTL, but
    governed by EVENT time (robust to source reordering inside the
    watermark, where a processing-time TTL is not) and running entirely
    JVM-side with no Python in the loop.

    Use the custom stateful twin when the policy needs more than
    first-wins (e.g. priority_dedup_stream's update-mode replacement) —
    the built-in cannot express emitting a BETTER row for an
    already-emitted key; use this one for plain exact dedup at scale.
    """
    return (
        docs.select(
            F.md5(F.col(text_col)).alias("digest"),
            F.col(id_col).cast("bigint").alias("survivor_id"),
            F.col(ts_col).alias("__ts"),
        )
        .withWatermark("__ts", delay)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("digest", "survivor_id", F.col("__ts").alias("event_ts"))
    )


def stream_bloom_decontaminate(
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    gram_words: int = 8,
    m_bits: int = 1 << 20,
    k: int = 5,
    salt: str = "bloom",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of dedup.bloom_decontaminate: incoming docs probe a
    STATIC Bloom bitmap of the eval grams ROW-LOCALLY, so unlike
    stream_contamination there is no per-micro-batch join at all — each
    document's verdict is a stateless projection (append mode, no
    aggregation, no watermark), which also means per-row latency instead
    of per-group update latency.

    Scale: the bitmap is one broadcast row (~m/8 bytes); the stream side
    is a pure scan. This is the decontamination shape for a firehose
    ingest: constant memory, zero shuffle, exactly the batch operator's
    one-sided-error semantics (bit-identical flags, pinned in pytest).
    """
    from mine_database_spark.operators.dedup import bloom_decontaminate

    # the batch operator is already a stateless crossJoin(broadcast) +
    # projection, which Structured Streaming supports verbatim
    return bloom_decontaminate(
        doc_stream, eval_docs, gram_words=gram_words, m_bits=m_bits,
        k=k, salt=salt, id_col=id_col, text_col=text_col,
    )


def stream_cms_table(
    item_stream: DataFrame,
    col: str,
    d: int = 4,
    w: int = 8192,
    salt: str = "cms",
) -> DataFrame:
    """Streaming twin of sketches.cms_table: the Count-Min cell counts as
    a NATIVE streaming aggregation (groupBy(row, col).count in update/
    complete mode) — no custom state handler needed, and the streaming
    state is bounded by d·w cells FOREVER, which is the whole point of
    sketching a firehose: an exact per-item streaming count would grow
    state with the distinct-item count, this never does. Identical cell
    values to the batch build on the same data (pinned in pytest), so
    cms_estimate serves either form.
    """
    from mine_database_spark.operators.sketches import _h2pair

    h1, h2 = _h2pair(F.col(col), salt)
    cells = item_stream.select(
        F.posexplode(
            F.array(*[F.pmod(h1 + i * h2, F.lit(w)) for i in range(d)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


def stream_hll_registers(
    item_stream: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """Streaming twin of sketches.hll_registers: the per-bucket max-rho
    register update as a NATIVE streaming aggregation (groupBy(bucket).
    max in update/complete mode). Register state is ≤ 1024 rows per group
    FOREVER — the constant-memory streaming form of count_distinct, whose
    exact streaming state grows with the distinct-value count. max() is
    order-insensitive and the bucket/rho derivation is the same integer
    expression as the batch build, so the registers are bit-identical to
    batch on the same data (pinned in pytest) and hll_estimate serves
    either form.
    """
    from mine_database_spark.operators.sketches import hll_registers

    # the batch operator is scan + groupBy(max) — a shape Structured
    # Streaming supports verbatim, so the twin IS the batch expression
    return hll_registers(item_stream, col, group_cols=group_cols, salt=salt)


def stream_hist_counts(
    item_stream: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 62,
) -> DataFrame:
    """Streaming twin of sketches.hist_bin_counts: the log2-bucket count
    registers as a NATIVE streaming aggregation (groupBy(group, bin).
    count in update/complete mode). State is <= n_bins counters per group
    FOREVER — the constant-memory streaming quantile sketch (an exact
    streaming percentile would buffer every value). count() is
    order-insensitive and the bin derivation is the same exact-integer
    expression as the batch build, so the registers are bit-identical to
    batch on the same data (pinned in pytest) and
    hist_quantiles_from_counts serves either form. Completes the sketch
    twin set: bloom (membership), CMS (frequency), HLL (cardinality),
    histogram (quantiles).
    """
    from mine_database_spark.operators.sketches import hist_bin_counts

    # the batch register build is scan + groupBy(count) — a shape
    # Structured Streaming supports verbatim, so the twin IS the batch
    # expression
    return hist_bin_counts(item_stream, col, group_cols=group_cols, n_bins=n_bins)


def stream_rate_anomaly(
    event_stream: DataFrame,
    baseline_stats: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "1 day",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Stream-static twin of sessionize.rate_anomaly: live windowed counts
    per key z-scored against a STATIC per-key baseline — the alerting form
    of the batch audit (the batch job publishes the baseline nightly; the
    stream flags a retry storm while it is happening, not in tomorrow's
    report).

    `baseline_stats` is the batch operator's integer stats shape:
    (key, cnt, s1, s2) — counts of/sum of/sum of squares of the
    historical per-bucket counts (exactly rate_anomaly's internals, so
    the z arithmetic is the identical exact-integer expression; pinned
    stream-vs-batch in pytest when the baseline derives from the same
    buckets). Returns (key, window, n, z, is_anomaly); both update mode
    (production — only changed windows re-emit) and complete mode are
    supported and pytest-pinned to the batch z values.

    Scale: a native windowed streaming count (state = one bigint per
    (key, open window)) joined to a broadcast static table — no
    stream-stream join, no custom state.
    """
    counts = (
        event_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    mean = F.col("s1") / F.col("cnt")
    var = (
        (F.col("cnt") * F.col("s2") - F.col("s1") * F.col("s1"))
        / (F.col("cnt") * F.col("cnt"))
    ).cast("double")
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    return counts.join(F.broadcast(baseline_stats), "key").select(
        "key",
        "window",
        "n",
        F.round(z, 4).alias("z"),
        (F.abs(F.round(z, 4)) >= z_threshold).alias("is_anomaly"),
    )


def rate_baseline_stats(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_days: int = 1,
) -> DataFrame:
    """The (key, cnt, s1, s2) baseline table stream_rate_anomaly consumes,
    computed from a historical batch — the publishing half of the
    stream-static pair (same bucket grid and integer internals as
    sessionize.rate_anomaly)."""
    from mine_database_spark.operators.sessionize import _micros

    us = _micros(events, ts_col)
    bucket_us = bucket_days * 86_400_000_000
    per = (
        events.select(F.col(key_col).alias("key"), us.alias("__us"))
        .select("key", F.expr(f"__us div {bucket_us}").alias("period"))
        .groupBy("key", "period")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return per.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )


def stream_fuzzy_contamination(
    doc_stream: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Streaming twin of operators/dedup.py:fuzzy_contamination — arriving
    training docs are MinHash-LSH-banded against a STATIC benchmark corpus
    and the band-collision candidates verified with the exact
    distinct-shingle Jaccard, exactly the batch semantics (same MH_AB
    constants, same band digests, same tie-break), completing the
    decontamination tier's streaming coverage (exact 8-gram:
    stream_contamination; bloom: stream_bloom_decontaminate; fuzzy: here).

    Structured Streaming allows ONE stateful aggregation per query, and
    the batch pipeline has two (the per-doc minhash groupBy and the final
    best-match groupBy) — so the stream side computes shingles AND the
    minhash signature ROW-LOCALLY with array expressions (one md5 per
    distinct shingle materialized via transform(), then num_hashes
    array_min folds; min over an array equals the batch min-aggregate),
    leaving only the final per-doc best-match aggregation as stream
    state. Update mode; each doc's verdict is final once its micro-batch
    commits (the static side never changes mid-query).

    The batch form dedups candidate pairs with a distinct() before the
    verify; distinct aggregation isn't available on a stream, so here a
    pair colliding in several bands survives only in its FIRST matching
    band — a row-local filter over the two carried band-sig arrays —
    which makes n_candidates a plain count and the verify (row-local
    array_intersect against the bench doc's shingle array) run exactly
    once per pair: identical to batch. Docs with < k words emit nothing
    (filtered pre-explode), as in batch.

    Scale: the static side is bands + shingle arrays of the BENCHMARK
    corpus (eval sets — small by nature; broadcasts automatically); the
    stream explodes num_hashes/rows_per_band band rows per doc carrying
    the doc's shingle array, and state is one row per flagged doc.
    """
    from mine_database_spark.functions.text import word_shingle_strings
    from mine_database_spark.operators.dedup import (
        MH_AB,
        MH_P,
        minhash_signatures,
        shingle_table,
    )

    n_bands = num_hashes // rows_per_band
    # stream side, all row-local: distinct shingles -> one md5 value per
    # shingle (materialized array: HOF lambdas re-evaluate repeated
    # subexpressions, so the digest is hoisted out of the num_hashes folds)
    sh = F.array_distinct(word_shingle_strings(F.col(text_col), k))
    t = doc_stream.select(
        F.col(id_col).alias("train_id"), sh.alias("__sh")
    ).where(F.size("__sh") > 0)
    x = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(MH_P),
    )
    t = t.withColumn("__x", x)
    def _perm(a: int, b: int):
        # closure factory: a default-arg lambda would grow extra parameters
        # and PySpark maps lambda arity onto the HOF's (value, index, ...)
        # variants
        return lambda v: (v * F.lit(a) + F.lit(b)) % F.lit(MH_P)

    mh = [
        F.array_min(F.transform(F.col("__x"), _perm(a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MH_AB[:num_hashes])
    ]
    t = t.select("train_id", "__sh", *mh)
    sig_exprs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh_{b * rows_per_band + j}")
                    for j in range(rows_per_band)
                ],
            )
        )
        for b in range(n_bands)
    ]
    # carry the doc's FULL sig array through the explode: a pair colliding
    # in several bands would hit once per band, and streaming can't
    # count_distinct it away — instead each joined row checks row-locally
    # whether its band is the pair's FIRST matching band and drops
    # otherwise, so every candidate pair survives exactly once and the
    # final aggregate is a plain count (no distinct state)
    tb = t.select(
        "train_id", "__sh", F.array(*sig_exprs).alias("__sigs")
    ).select(
        "train_id", "__sh", "__sigs",
        F.posexplode("__sigs").alias("band", "band_sig"),
    )

    # static bench side: the batch signature helpers verbatim (same
    # constants → same digests), then the same full-array carry
    sig_b = minhash_signatures(
        shingle_table(bench, id_col, text_col, k, distinct=False), num_hashes
    )
    bb = sig_b.select(
        F.col("doc_id").alias("bench_id"), F.array(*sig_exprs).alias("__bsigs")
    ).select(
        "bench_id", "__bsigs",
        F.posexplode("__bsigs").alias("band", "band_sig"),
    )
    bsh = bench.select(
        F.col(id_col).alias("bench_id"),
        F.array_distinct(word_shingle_strings(F.col(text_col), k)).alias("__bsh"),
    )

    first_match = F.array_position(
        F.zip_with("__sigs", "__bsigs", lambda a, b: a == b), F.lit(True)
    )
    i = F.size(F.array_intersect(F.col("__sh"), F.col("__bsh")))
    jac = F.round(
        i / (F.size("__sh") + F.size("__bsh") - i), 6
    )
    scored = (
        tb.join(bb, ["band", "band_sig"])
        .where(F.col("band") == first_match - 1)  # posexplode is 0-based
        .join(bsh, "bench_id")
        .select("train_id", "bench_id", jac.alias("jaccard"))
    )
    best = scored.groupBy("train_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_candidates"),
        F.max("jaccard").alias("best_jaccard"),
        F.min_by(
            "bench_id",
            F.struct((-F.col("jaccard")).alias("nj"), F.col("bench_id").alias("b")),
        ).alias("best_bench_id"),
    )
    return best.select(
        F.col("train_id").alias("doc_id"),
        F.col("best_bench_id").alias("bench_id"),
        "n_candidates",
        F.col("best_jaccard").alias("jaccard"),
        (F.col("best_jaccard") >= min_jaccard).alias("contaminated"),
    )


def stream_binary_dedup(
    media_stream: DataFrame,
    corpus: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    corpus_blob_col: str = "blob",
) -> DataFrame:
    """Streaming byte-exact media dedup: arriving blobs pass through only
    when their sha2-256 digest is NOT in the STATIC historical corpus —
    stream_incremental_dedup's contract for binary columns (the crawl-side
    asset stream: re-fetched images drop on arrival, no decode needed).
    Stream-static left-anti join: no state store, no watermark — memory to
    bound lives on the static digest projection, which at 100 TB is the
    persisted digest artifact, not stream state. Only the fixed 64-char
    digest leaves the scan on either side; blobs never shuffle.

    Emits (id_col, digest) per surviving blob in append mode. NULL blobs
    pass through (digest NULL never equals a corpus digest) — route them
    to a quarantine sink downstream."""
    digests = corpus.select(
        F.sha2(F.col(corpus_blob_col), 256).alias("digest")
    ).distinct()
    return media_stream.select(
        F.col(id_col), F.sha2(F.col(blob_col), 256).alias("digest")
    ).join(digests, "digest", "left_anti")


def stream_decontaminate_spans(
    train_stream: DataFrame,
    bench: DataFrame,
    span_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of dedup.decontaminate_spans — the REPAIR-policy
    decontamination tier on a live ingest: every sliding span_words-token
    window of an arriving doc that appears in the STATIC benchmark corpus
    is cut, surviving tokens rebuild the document, short docs pass
    through — bit-identical to batch (pinned in pytest on the same
    planted quote/clean/verbatim/short cases).

    Where the batch form explodes a positional span index and semi-joins
    the bench digests, a stream needs no shuffle at all: the bench
    reduces to its DISTINCT window digests (eval sets are small — ONE
    broadcast row, the stream_bloom_decontaminate shape), each doc's
    dirty digests resolve row-locally with array_intersect (hash-set
    build over the two arrays, not a quadratic contains-scan), the
    interval merge is a fold over the ascending dirty starts (the batch
    gaps-and-islands window collapses to one pass because a single doc's
    spans are already sorted row-locally), and the rebuild reuses the
    batch keep-filter expression shape. Append mode, no aggregation, no
    watermark, no state store: per-row latency, constant memory.

    Returns (doc_id, clean_text, n_toks, n_dropped) — the batch contract.
    """
    if span_words < 1:
        raise ValueError(f"span_words must be >= 1, got {span_words}")
    w = span_words

    # static side: distinct bench window digests, collapsed to one
    # broadcastable row (empty bench -> empty array, nothing cuts)
    bwords = F.split(F.col(text_col), " ")
    bn = F.size(F.col("__btoks"))
    bench_row = (
        bench.select(bwords.alias("__btoks"))
        .where(bn >= w)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), bn - w),
                    lambda p: F.md5(
                        F.concat_ws(" ", F.slice(F.col("__btoks"), p + 1, w))
                    ),
                )
            ).alias("__digest")
        )
        .agg(F.array_sort(F.collect_set("__digest")).alias("__bench"))
    )

    toks = F.split(F.col(text_col), " ")
    base = train_stream.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).crossJoin(F.broadcast(bench_row))
    n = F.size(F.col("__toks"))
    # (start, digest) span structs — digests materialized once (HOF
    # lambdas re-evaluate repeated subexpressions)
    spans = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda p: F.struct(
                p.alias("s"),
                F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), p + 1, w))).alias(
                    "d"
                ),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<s:int,d:string>>"))
    # each explode([1]) below is a CollapseProject barrier (the
    # similarity.py recipe): the span/cut stages reference their
    # predecessor more than once, and an interpreted projection (HOFs are
    # CodegenFallback) re-evaluates an INLINED subtree — including its
    # md5-per-window digests — once per reference; materializing each
    # stage as an attribute keeps per-row work linear in the doc
    base = base.withColumn("__spans", spans).withColumn(
        "__b1", F.explode(F.array(F.lit(1)))
    )
    dirty_digests = F.array_intersect(
        F.transform(F.col("__spans"), lambda s: s["d"]),
        F.coalesce(F.col("__bench"), F.expr("array()").cast("array<string>")),
    )
    base = base.withColumn("__dirty", dirty_digests)
    starts = F.transform(
        F.filter(
            F.col("__spans"), lambda s: F.array_contains(F.col("__dirty"), s["d"])
        ),
        lambda s: s["s"],
    )
    # merge ascending fixed-width [s, s+w) ranges into disjoint cut
    # intervals: one fold, extending the open interval while s < last.e
    cuts = F.aggregate(
        starts,
        F.expr("array()").cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], s + F.lit(w)
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc, F.array(F.struct(s.alias("s"), (s + F.lit(w)).alias("e")))
            )
        ),
    )
    base = base.withColumn("__cuts", cuts).withColumn(
        "__b2", F.explode(F.array(F.lit(1)))
    )
    kept = F.when(F.size(F.col("__cuts")) == 0, F.col("__toks")).otherwise(
        F.transform(
            F.filter(
                F.transform(
                    F.col("__toks"), lambda x, i: F.struct(x.alias("t"), i.alias("i"))
                ),
                lambda s: ~F.exists(
                    F.col("__cuts"), lambda c: (s["i"] >= c["s"]) & (s["i"] < c["e"])
                ),
            ),
            lambda s: s["t"],
        )
    )
    base = base.withColumn("__kept", kept).withColumn(
        "__b3", F.explode(F.array(F.lit(1)))
    )
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
        F.size(F.col("__toks")).cast("bigint").alias("n_toks"),
        (F.size(F.col("__toks")) - F.size(F.col("__kept")))
        .cast("bigint")
        .alias("n_dropped"),
    )


def stream_lang_id(
    doc_stream: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of quality.CharBigramLangID.transform: arriving docs
    score against a FITTED model's quantized log-prob literals — a
    stateless projection (append mode, no aggregation, no watermark, no
    state store), the stream_bloom_decontaminate shape: the fit happened
    offline (or on the static corpus), the stream pays only the per-row
    head-window scan. Emits (id_col, pred_lang, score_q) per doc,
    bit-identical to the batch scorer (pinned in pytest). shape='fold'
    is load-bearing: the batch-default 'agg' shape groups by doc — a
    streaming aggregation demanding watermark + update mode — while the
    fold is a per-row projection that keeps this append-mode stateless."""
    return model.transform(
        doc_stream, id_col=id_col, text_col=text_col, shape="fold"
    )
