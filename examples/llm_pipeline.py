"""End-to-end training-data pipeline template — the LLM-corpus counterpart
of run_template.py, composing the SURVEY §2.13 operators in the order a
production pretraining pipeline runs them:

   1. Ingest documents
   2. Exact dedup (first-occurrence wins)
   3. Near-dup removal (MinHash-LSH pairs -> connected components -> keep
      cluster minimum)
   4. Rule-based quality gate (Gopher-style), model-based quality score,
      bigram-LM perplexity decile gate, per-source length-percentile
      curation, character-entropy degenerate-tail gate
   5. Eval-set decontamination (shared-8-gram scan)
   6. Domain re-balancing (temperature sampling), optional hard
      per-source ceiling (stratified cap sample)
   7. Context-window chunking
   8. Token-budget output shards (distributed prefix sum), written
      partitioned by shard
   9. Corpus-health report over the shipped survivors (Zipf slope,
      trigram diversity, length quantiles) — the closing audit gate

Every stage is a DataFrame -> DataFrame transform, so Catalyst sees whole
stage chains (filters push into the scan). One deliberate materialization:
the post-near-dup survivor set is persisted, because five downstream stages
plus the per-stage count() reports all branch from it — without it each
action would replay the dedup joins from the scan. Run directly
(`python examples/llm_pipeline.py`) for a toy pass at sf0.001, or import
`run()` and point it at a documents table of any size.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(
    docs_path: str | None = None,
    eval_docs_path: str | None = None,
    out_dir: str | None = None,
    chunk_size: int = 64,
    stride: int = 64,
    shard_token_budget: int = 4096,
    neardup_threshold: float = 0.7,
    quality_threshold: float = 0.4,
    mixture_alpha: float = 0.7,
    entropy_bounds: tuple[float, float] = (1.5, 6.0),
    source_cap: int | None = None,
    app_name: str = "mine-spark-llm-pipeline",
) -> dict:
    """Execute the shaping pipeline; returns per-stage survivor counts.

    `docs_path` defaults to the sf0.001 synthetic documents table;
    `eval_docs_path` defaults to a small slice of the same table standing in
    for the held-out eval set (so decontamination has something to catch).
    """
    from pyspark.sql import functions as F

    from mine_database_spark.operators import dedup as dd
    from mine_database_spark.operators import graph as gr
    from mine_database_spark.operators import packing as pk
    from mine_database_spark.operators.quality import LogisticQualityClassifier
    from mine_database_spark.functions.text import word_shingle_strings
    from mine_database_spark.session import get_spark

    spark = get_spark(app_name)
    spark.sparkContext.setLogLevel("ERROR")
    start = time.time()
    docs_path = docs_path or "/root/testdata/sf0.001/documents.parquet"
    out_dir = out_dir or os.path.join(tempfile.mkdtemp(prefix="llm_pipeline_"), "shards")

    counts: dict[str, int] = {}

    # 1. ingest ------------------------------------------------------------
    docs = spark.read.parquet(docs_path).select("doc_id", "source", "lang", "text")
    counts["ingested"] = docs.count()

    # 2. exact dedup (min-id survivor per content digest) ------------------
    survivors = dd.exact_dedup(docs).select(F.col("survivor_id").alias("doc_id"))
    docs = docs.join(survivors, "doc_id", "left_semi")
    counts["after_exact_dedup"] = docs.count()

    # 3. near-dup removal, the production shape: MinHash-LSH candidates ->
    #    exact Jaccard verify only within buckets -> duplicate clusters ->
    #    drop everything but each cluster's minimum id ----------------------
    cand = dd.minhash_lsh_dedup(docs)
    pairs = dd.ngram_jaccard_pairs(docs, candidates=cand, threshold=neardup_threshold)
    clusters = gr.connected_components(pairs)
    losers = clusters.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    # localCheckpoint (NOT persist): each scrub stage below joins the frame
    # back to itself, multiplying the LOGICAL plan ~3-4x per stage, and the
    # perplexity stage's prefix-sum machinery doubles it again — persist
    # caches data but every downstream action still re-ANALYZES the whole
    # tree (single-threaded driver work that grows exponentially with
    # pipeline depth; measured: minutes of driver CPU at 500 rows).
    # localCheckpoint materializes AND truncates the lineage, resetting
    # analysis cost at each stage boundary — the connected_components
    # doctrine applied to the pipeline spine.
    docs = docs.join(losers, "doc_id", "left_anti").localCheckpoint()
    counts["after_near_dedup"] = docs.count()

    # 3b. segment-level boilerplate scrub: repeated word-window blocks
    #     (headers/footers/licenses) survive once, in the earliest carrier;
    #     fully-boilerplate documents drop
    scrubbed = dd.segment_dedup(docs, seg_words=32)
    docs = (
        docs.drop("text")
        .join(
            scrubbed.where(F.col("clean_text") != "").select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        )
    )
    counts["after_segment_scrub"] = docs.count()

    # 3c. sliding-window exact-substring scrub (Lee et al. ExactSubstr):
    #     a passage repeated at ANY offset survives once, in its earliest
    #     carrier; documents scrubbed to empty drop
    despanned = dd.repeated_span_scrub(docs, span_words=8)
    docs = docs.drop("text").join(
        despanned.where(F.col("clean_text") != "").select(
            "doc_id", F.col("clean_text").alias("text")
        ),
        "doc_id",
    ).localCheckpoint()  # truncate the two scrubs' self-join plan growth
    counts["after_span_scrub"] = docs.count()

    # 4. quality: rule gate, then model score ------------------------------
    clf = LogisticQualityClassifier()
    scored = clf.transform(docs, threshold=quality_threshold)
    docs = docs.join(scored.where(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    counts["after_quality"] = docs.count()

    # 4b. perplexity gate: corpus-trained bigram LM, drop the worst decile
    #     (CCNet-style; deciles via distributed_ntile, never a global
    #     unpartitioned window). Docs too short to score (<2 tokens) drop
    #     with the gated decile.
    from mine_database_spark.operators.quality import bigram_logprob

    # checkpoint the tiny (doc_id, avg_logprob) frame: distributed_ntile
    # fans out into rank + total-count branches that would otherwise each
    # re-analyze (and re-execute) the LM plan
    per = bigram_logprob(docs).localCheckpoint()
    ok = pk.distributed_ntile(per, 10, ["avg_logprob", "doc_id"], out_col="decile").where(
        F.col("decile") > 1
    )
    docs = docs.join(ok.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    counts["after_perplexity"] = docs.count()

    # 4c. per-source length curation: drop each source's shortest decile —
    #     a per-group exact-percentile threshold (O(#sources) broadcast,
    #     zero corpus shuffle), so a short-form source keeps its best docs
    #     instead of being wiped out by one global length constant
    from mine_database_spark.functions.text import token_count
    from mine_database_spark.operators.quality import percentile_filter

    sized = docs.select("doc_id", "source", token_count(F.col("text")).alias("n_tokens"))
    long_enough = percentile_filter(sized, "n_tokens", p=0.10, group_col="source")
    docs = docs.join(long_enough.select("doc_id"), "doc_id", "left_semi")
    counts["after_length_curation"] = docs.count()

    # 4d. character-entropy gate: drop the degenerate tails — padding/
    #     repeated-char docs (entropy near 0) and random/base64 blobs
    #     (near 6 bits) — a zero-shuffle row-local fold, so the gate is
    #     free inside the existing scan
    from mine_database_spark.functions.text import char_entropy

    ent = char_entropy(F.col("text"))
    docs = docs.where((ent >= entropy_bounds[0]) & (ent <= entropy_bounds[1]))
    counts["after_entropy"] = docs.count()

    # 5. decontamination vs the eval set (any shared 8-gram) ---------------
    eval_docs = (
        spark.read.parquet(eval_docs_path).select("doc_id", "text")
        if eval_docs_path
        else spark.read.parquet(docs_path).select("doc_id", "text").where(F.col("doc_id") % 97 == 0)
    )
    grams = lambda df, side: df.select(
        F.col("doc_id").alias(side), F.explode(word_shingle_strings(F.col("text"), 8)).alias("g")
    )
    dirty = (
        grams(docs, "doc_id")
        .join(grams(eval_docs, "eval_id").select("g").distinct(), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    docs = docs.join(dirty, "doc_id", "left_anti")
    counts["after_decontamination"] = docs.count()

    # 6. domain re-balance across languages --------------------------------
    kept = pk.temperature_sample(docs, alpha=mixture_alpha, source_col="lang", id_col="doc_id")
    docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    counts["after_mixture"] = docs.count()

    # 6b. optional hard per-source ceiling: exactly min(cap, n) docs per
    #     source by deterministic hash order (temperature sampling hits
    #     budgets only in expectation; this is the hard guarantee)
    if source_cap is not None:
        capped = pk.stratified_cap_sample(docs, cap=source_cap, stratum_col="source")
        docs = docs.join(capped.select("doc_id"), "doc_id", "left_semi")
        counts["after_source_cap"] = docs.count()

    # 7. chunk to context windows ------------------------------------------
    chunks = pk.chunk_documents(docs, chunk_size=chunk_size, stride=stride)
    counts["chunks"] = chunks.count()

    # 8. token-budget shards over the chunk stream, written partitioned ----
    # chunk id = doc_id << 32 | chunk_idx: chunk_idx is a 32-bit int so the
    # synthesized key is collision-free for doc_ids < 2^31 (a decimal
    # multiplier could collide on pathologically long documents)
    shard_docs = chunks.select(
        (F.shiftleft(F.col("doc_id"), 32) + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    shards = pk.token_budget_shards(shard_docs, budget=shard_token_budget)
    final = shard_docs.join(shards.select("doc_id", "shard_id"), "doc_id")
    final.write.mode("overwrite").partitionBy("shard_id").parquet(out_dir)
    counts["shards"] = spark.read.parquet(out_dir).select("shard_id").distinct().count()

    # 9. corpus-health report over the SHIPPED corpus ----------------------
    #    the audit tier as a closing gate: distributional health (Zipf
    #    slope / top-token share), across-document repetition (trigram
    #    diversity), and length quantiles per source — the numbers a data
    #    lead reads before signing the snapshot; each is one extra pass
    #    over the survivor set, nothing corpus-sized collects (the report
    #    is O(#sources) rows folded to floats here)
    from mine_database_spark.operators.quality import ngram_diversity, zipf_audit
    from mine_database_spark.operators.sketches import hist_quantiles

    audit_src = docs.withColumn("n_chars", F.length("text"))
    za = zipf_audit(audit_src, top_n=50).agg(
        F.round(F.avg("zipf_slope"), 4).alias("s"),
        F.round(F.max("top_share"), 4).alias("t"),
    ).collect()[0]
    counts["audit_mean_zipf_slope"] = za["s"]
    counts["audit_max_top_share"] = za["t"]
    nd = ngram_diversity(audit_src).agg(
        F.round(F.min("diversity"), 4).alias("d")
    ).collect()[0]
    counts["audit_min_trigram_diversity"] = nd["d"]
    hq = {
        (r["source"], r["pct"]): r["est_hi"]
        for r in hist_quantiles(
            audit_src, "n_chars", pcts=(99,), group_cols=["source"]
        ).collect()
    }
    counts["audit_max_p99_chars_bin_hi"] = max(hq.values()) if hq else 0
    # distribution-SHAPE shift the pipeline itself introduced: two-sample
    # KS between the raw input's and the shipped survivors' length
    # distributions — a D near 1 means shaping gutted a length band
    # (e.g. a quality threshold silently dropping everything short),
    # which the per-source quantiles above can mask
    from mine_database_spark.operators.quality import ks_drift

    raw_lens = spark.read.parquet(docs_path).select(
        F.length("text").alias("n_chars")
    )
    ks = ks_drift(raw_lens, audit_src.select("n_chars"), "n_chars").collect()[0]
    counts["audit_length_ks_vs_input"] = ks["d_stat"]
    counts["wall_seconds"] = round(time.time() - start, 1)
    counts["out_dir"] = out_dir
    # localCheckpoint blocks are dropped when their RDDs are GC'd; no
    # explicit unpersist bookkeeping needed across repeated run() calls
    return counts


def drift_report(
    docs_old,
    docs_new,
    emb_old=None,
    emb_new=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k_tokens: int = 10,
    emb_group_col: str = "label",
):
    """Cross-snapshot drift report — two corpus versions in, ONE tall
    drift table out, composing the four isolated drift monitors the way a
    data lead reads them between crawls:

      section='membership' — added/removed/changed/unchanged doc counts
        (dedup.snapshot_diff): the coverage story.
      section='length_ks'  — the two-sample KS D statistic and its argmax
        length (quality.ks_drift on char length): the distribution-SHAPE
        story — a crawler suddenly returning truncated pages moves D long
        before any mean does.
      section='token_kl_new' / 'token_kl_gone' — the top-k tokens by
        |KL contribution| (quality.token_drift), run in BOTH directions:
        KL weights terms by the FIRST distribution, so a flood token
        (huge now, absent before) only ranks when the new snapshot is P
        ('token_kl_new' — what flooded in) and a source going dark only
        ranks when the old snapshot is P ('token_kl_gone' — what
        disappeared). One direction alone misses the other failure mode.
      section='embedding'  — per-group centroid-direction drift
        (similarity.embedding_drift), when both snapshots' embeddings are
        supplied: the topic-geometry story.

    Returns (section, item, value) — value is DOUBLE throughout (counts
    are exact integers below 2^53). Every section reduces to O(k) or
    O(groups) rows before the final union; the corpus-sized work is the
    operators' own single scans.
    """
    from pyspark.sql import functions as F

    from mine_database_spark.operators.dedup import snapshot_diff
    from mine_database_spark.operators.quality import ks_drift, token_drift

    def tall(df, section, item_col, value_col):
        return df.select(
            F.lit(section).alias("section"),
            F.col(item_col).cast("string").alias("item"),
            F.col(value_col).cast("double").alias("value"),
        )

    membership = (
        snapshot_diff(docs_old, docs_new, id_col=id_col, content_cols=(text_col,))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    lens = lambda df: df.select(F.length(text_col).alias("n_chars"))
    ks = ks_drift(lens(docs_old), lens(docs_new), "n_chars")
    ks_tall = ks.select(
        F.explode(
            F.array(
                F.struct(F.lit("d_stat").alias("item"), F.col("d_stat").cast("double").alias("value")),
                F.struct(F.lit("at_value").alias("item"), F.col("at_value").cast("double").alias("value")),
            )
        ).alias("kv")
    ).select(F.lit("length_ks").alias("section"), F.col("kv.item"), F.col("kv.value"))
    toks_new = token_drift(docs_new, docs_old, text_col=text_col, top_k=top_k_tokens)
    toks_gone = token_drift(docs_old, docs_new, text_col=text_col, top_k=top_k_tokens)
    parts = [
        tall(membership, "membership", "status", "n"),
        ks_tall,
        tall(toks_new, "token_kl_new", "tok", "kl_term"),
        tall(toks_gone, "token_kl_gone", "tok", "kl_term"),
    ]
    if emb_old is not None and emb_new is not None:
        from mine_database_spark.operators.similarity import embedding_drift

        parts.append(
            tall(
                embedding_drift(emb_old, emb_new, group_col=emb_group_col),
                "embedding",
                emb_group_col,
                "drift",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


if __name__ == "__main__":
    for k, v in run().items():
        print(f"{k:24s} {v}")
