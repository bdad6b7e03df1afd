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


def exact_dedup_stream(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Streaming form of operators.dedup.exact_dedup: emit each md5(text)
    digest the first time it appears across the whole stream; later
    duplicates (same batch or any later batch) are suppressed.

    Output rows (digest, survivor_id) arrive in outputMode("update").
    """
    src = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("bigint").alias("survivor_id"),
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain: all rows for this digest are duplicates
                pass
            return
        survivor = None
        for pdf in pdfs:
            if len(pdf):
                batch_min = int(pdf["survivor_id"].min())
                survivor = batch_min if survivor is None else min(survivor, batch_min)
        if survivor is not None:
            state.update((survivor,))
            yield pd.DataFrame({"digest": [key[0]], "survivor_id": [survivor]})

    return src.groupBy("digest").applyInPandasWithState(
        dedup_fn,
        outputStructType="digest string, survivor_id bigint",
        stateStructType="survivor_id bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
