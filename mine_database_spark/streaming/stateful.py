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
    state_ttl_minutes: int | None = None,
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
    ttl_ms = None if state_ttl_minutes is None else int(state_ttl_minutes) * 60_000

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
