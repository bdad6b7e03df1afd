"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming surface (SURVEY §2.11); this extends the
engine's dedup family to unbounded inputs: exact dedup across micro-batches
needs per-key state (has this digest been seen before?), which is exactly
the GroupState contract. State is one small tuple per distinct digest,
partitioned by the digest hash — at 100 TB of stream history the state store
scales horizontally with executors and RocksDB state backend; no driver
state is held.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def exact_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming form of operators.dedup.exact_dedup: emit each md5(text)
    digest the first time it appears across the whole stream; later
    duplicates (same batch or any later batch) are suppressed.

    Output rows (digest, survivor_id) arrive in outputMode("update").

    `state_ttl_minutes` bounds state for unbounded streams: a digest whose
    entry goes unrefreshed for the TTL is evicted (processing-time timeout),
    so a duplicate arriving after a TTL-length quiet period is re-admitted
    as new — the standard dedup-window tradeoff. Each sighting of a digest
    refreshes its TTL. Default None keeps state forever (exact dedup over
    the whole stream history; at 100 TB this needs the RocksDB state
    backend and is why the TTL knob exists).
    """
    src = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("bigint").alias("survivor_id"),
    )
    # fractional minutes supported (eviction tests drive seconds-scale TTLs)
    ttl_ms = None if state_ttl_minutes is None else int(round(state_ttl_minutes * 60_000))

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL eviction: forget the digest, emit nothing
            return
        if state.exists:
            for _ in pdfs:  # drain: all rows for this digest are duplicates
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # sighting refreshes TTL
            return
        survivor = None
        for pdf in pdfs:
            if len(pdf):
                batch_min = int(pdf["survivor_id"].min())
                survivor = batch_min if survivor is None else min(survivor, batch_min)
        if survivor is not None:
            state.update((survivor,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({"digest": [key[0]], "survivor_id": [survivor]})

    return src.groupBy("digest").applyInPandasWithState(
        dedup_fn,
        outputStructType="digest string, survivor_id bigint",
        stateStructType="survivor_id bigint",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def minhash_neardup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming near-duplicate candidates — the unbounded-input twin of
    operators.dedup.minhash_lsh_dedup.

    Per-doc minhash band signatures are computed ROW-LOCALLY (one md5 per
    distinct shingle, the same universal-hash family MH_AB and band digest
    as the batch path, so batch and stream bucket IDENTICALLY); each
    (band, band_sig) bucket's GroupState remembers the FIRST doc that hit
    it, and every later doc in the bucket emits a candidate pair
    (doc_id, band, first_id). This is lsh_candidate_pairs restricted to
    pairs with the bucket's first arrival — the streaming tradeoff that
    keeps state at ONE small tuple per bucket instead of the bucket's doc
    list. Chain ngram_jaccard_pairs(candidates=...) over the emitted
    pairs for the exact-verify pass, as examples/llm_pipeline.py does in
    batch.

    Docs too short to produce a k-shingle emit nothing (the batch shingle
    table has no rows for them either). `state_ttl_minutes` bounds bucket
    state exactly like exact_dedup_stream: an unrefreshed bucket evicts
    after the TTL and its next hit is treated as first-seen. Note that a
    ProcessingTimeTimeout query idles waiting for its TTLs rather than
    self-terminating — drive it with a processingTime trigger and stop it
    explicitly (Trigger.AvailableNow will hang at shutdown).

    Scale: signatures/bands are scan-side expressions (zero shuffle before
    the state exchange); the state store is hash-partitioned by bucket and
    scales with executors (RocksDB backend at 100 TB of stream history).
    """
    from mine_database_spark.operators.dedup import MH_AB, MH_P

    if num_hashes > len(MH_AB):
        raise ValueError(f"num_hashes must be <= {len(MH_AB)}")
    from mine_database_spark.functions.text import word_shingle_strings

    xs = F.transform(
        F.array_distinct(word_shingle_strings(F.col(text_col), k)),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") % MH_P,
    )
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"), xs.alias("__xs")
    ).where(F.size("__xs") > 0)
    keyed = _row_local_band_keys(base, num_hashes, rows_per_band)
    ttl_ms = None if state_ttl_minutes is None else int(round(state_ttl_minutes * 60_000))
    return _first_wins_bucket_stream(keyed, ttl_ms)


def _row_local_band_keys(
    base: DataFrame, num_hashes: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, band_sig) from a (doc_id, __xs) frame whose __xs is
    the row's MH-domain shingle values — the scan-side half shared by the
    text and binary streaming near-dup twins. Same universal-hash family
    MH_AB and band digest as the batch stack (dedup.minhash_signatures /
    lsh_band_keys), so batch and stream bucket IDENTICALLY."""
    from mine_database_spark.operators.dedup import MH_AB, MH_P

    n_bands = num_hashes // rows_per_band

    def _perm(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % MH_P

    mh = [
        F.array_min(F.transform(F.col("__xs"), _perm(a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MH_AB[:num_hashes])
    ]
    sigs = base.select("doc_id", *mh)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
                    )
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )


def _first_wins_bucket_stream(keyed: DataFrame, ttl_ms: int | None) -> DataFrame:
    """The shared first-wins band-bucket state stage: each (band,
    band_sig) bucket's GroupState remembers the FIRST doc_id that hit it;
    every later doc emits (doc_id, band, matched_id). State is ONE small
    tuple per bucket; `ttl_ms` evicts quiet buckets (their next hit is
    treated as first-seen)."""

    def bucket_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        if not ids:
            return
        # dedupe within the batch AND against the stored first: a source
        # re-delivering the bucket's first doc must not emit a
        # (doc_id == matched_id) self-pair
        ids = sorted(set(ids))
        if state.exists:
            (first,) = state.get
            later = [i for i in ids if i != first]
        else:
            first, later = ids[0], ids[1:]
            state.update((first,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if later:
            yield pd.DataFrame(
                {
                    "doc_id": later,
                    "band": [key[0]] * len(later),
                    "matched_id": [first] * len(later),
                }
            )

    return keyed.groupBy("band", "band_sig").applyInPandasWithState(
        bucket_fn,
        outputStructType="doc_id bigint, band int, matched_id bigint",
        stateStructType="first_id bigint",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def binary_neardup_stream(
    media: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    k: int = 8,
    max_bytes: int = 4096,
    sample_mod: int = 4,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming near-duplicate candidates over BINARY payloads — the
    unbounded-input twin of operators.multimodal.binary_neardup,
    completing the byte-gram tier's streaming coverage next to
    stream_binary_dedup's exact sha256 (r14 verdict #7): a re-fetched
    asset with a new tracking trailer is caught ON ARRIVAL, before any
    decode.

    Row-local scan side mirrors binary_shingle_table exactly: hex byte
    k-grams at every offset of the blob's first `max_bytes` bytes (whole
    hex as one gram for 1..k-1-byte blobs; nothing for empty/NULL),
    mod-sampled on the gram md5's raw 32-bit value % sample_mod (shift-
    invariant selection, and the SAME value the batch path tests) — then
    the shared MH_AB minhash/banding, so batch and stream bucket
    IDENTICALLY (pinned in pytest). The filter runs on HOISTED raw
    hashes (one md5 per distinct gram; an interpreted HOF re-evaluates a
    repeated subexpression per reference otherwise), and x = raw % MH_P
    matches dedup.minhash_signatures bit-for-bit.

    Emits (doc_id, band, matched_id) first-wins candidates per bucket,
    one small state tuple per bucket (`state_ttl_minutes` as the other
    dedup streams). Chain the batch verifier (binary_neardup's n_agree /
    est_jaccard, or a byte diff) over the emitted pairs offline.

    Scale: blobs never shuffle — grams, sampling, signatures, and band
    digests are all scan-side expressions; only (doc_id, band, band_sig)
    rows reach the state exchange, hash-partitioned by bucket."""
    from mine_database_spark.operators.dedup import MH_P

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_bytes < k:
        raise ValueError(f"max_bytes must be >= {k}, got {max_bytes}")
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    hx = F.hex(F.expr(f"substring({blob_col}, 1, {int(max_bytes)})"))
    nbytes = (F.length(hx) / 2).cast("int")
    grams = (
        F.when(
            nbytes >= k,
            F.transform(
                F.sequence(F.lit(1), nbytes - (k - 1)),
                lambda j: F.substring(hx, j * 2 - 1, 2 * k),
            ),
        )
        .when(nbytes >= 1, F.array(hx))
        .otherwise(F.array().cast("array<string>"))
    )
    raws = F.transform(
        F.array_distinct(grams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
    )
    if sample_mod > 1:
        raws = F.filter(raws, lambda r: r % sample_mod == 0)
    xs = F.transform(raws, lambda r: r % MH_P)
    base = media.select(
        F.col(id_col).cast("bigint").alias("doc_id"), xs.alias("__xs")
    ).where(F.size("__xs") > 0)
    keyed = _row_local_band_keys(base, num_hashes, rows_per_band)
    ttl_ms = None if state_ttl_minutes is None else int(round(state_ttl_minutes * 60_000))
    return _first_wins_bucket_stream(keyed, ttl_ms)


def priority_dedup_stream(
    docs: DataFrame,
    priority: "dict[str, int]",
    default_priority: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming form of operators.dedup.priority_dedup: per content digest,
    track the best copy seen so far under the (source-priority rank, id)
    order and EMIT AN UPDATE whenever a strictly better copy arrives — so
    in outputMode("update") the LATEST row per digest always equals the
    batch operator's survivor over every batch delivered so far. A
    curated re-publication arriving after the crawl copy therefore
    *replaces* it downstream, which append-only first-wins dedup cannot
    express.

    Output rows: (digest, survivor_id, survivor_source). The priority map
    is applied in plain Python inside the state function (the batch twin
    inlines it as a literal MAP expression — same semantics: unmapped and
    NULL sources take `default_priority`, ties fall back to min id).

    State is one (rank, id, source) tuple per distinct digest, partitioned
    by the digest hash; `state_ttl_minutes` evicts quiet digests exactly
    like exact_dedup_stream (a post-TTL duplicate re-admits as new).
    """
    src = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(source_col).cast("string").alias("source"),
    )
    ttl_ms = None if state_ttl_minutes is None else int(round(state_ttl_minutes * 60_000))
    prio = dict(priority)
    default = int(default_priority)

    def best_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = None  # (rank, id, source); source never compared — (rank, id) is unique
        for pdf in pdfs:
            for i, s in zip(pdf["doc_id"], pdf["source"]):
                s = None if pd.isna(s) else str(s)
                cand = (prio.get(s, default), int(i), s)
                if best is None or cand[:2] < best[:2]:
                    best = cand
        if best is None:
            return
        if state.exists:
            r0, i0, s0 = state.get
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            if (int(r0), int(i0)) <= best[:2]:
                return  # stored copy still wins: no update
        # int() matches the bigint state column: numpy/pandas integer
        # subclasses are rejected by the state encoder, and the batch twin
        # accepts arbitrary int priorities (so the rank column must be i64)
        state.update((int(best[0]), best[1], best[2]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "digest": [key[0]],
                "survivor_id": [best[1]],
                "survivor_source": [best[2]],
            }
        )

    return src.groupBy("digest").applyInPandasWithState(
        best_fn,
        outputStructType="digest string, survivor_id bigint, survivor_source string",
        stateStructType="r bigint, survivor_id bigint, survivor_source string",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
