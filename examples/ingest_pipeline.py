"""Crawl-side ingest template — the stage BEFORE examples/llm_pipeline.py:
raw fetches (markup + fetch URL) become the clean, URL- and
content-deduplicated plain-document table the shaping pipeline starts from.

   1. Markup-to-text extraction (functions.text.strip_html) — script/style/
      comment removal, block tags to line breaks, entity unescape; a pure
      regexp-chain scan
   2. Dedup by canonical URL (functions.urls.canonical_url) — two fetches of
      one resource differing in case/fragment/tracking-params/slash collapse;
      the earliest fetch survives
   3. Normalization-insensitive content dedup (dedup.normalized_dedup) —
      reformatted re-publications (case/punct/whitespace) collapse where
      byte-exact dedup cannot
   4. Skew-aware source-stats enrichment (operators.skew) — the key-skew
      audit on the join key decides, per batch, whether the join salts
   5. Duplicate-cluster STRUCTURE audit (dedup.minhash_lsh_dedup +
      graph.triangle_count_deg) — LSH near-dup pairs over the survivors
      form a graph whose triangles are CLUSTERED duplication (template
      families); high-clustering-coefficient docs route to review while
      triangle-free pairwise hits are left as noise

The synthetic corpus is already plain text, so step 0 derives a messy fetch
record (HTML wrapper + noisy URL, plus a reformatted duplicate fetch for
every third document) deterministically — the registry q_html_extract /
q_url_dedup convention. Every stage is a DataFrame transform; nothing leaves
the JVM. Output schema is a superset of llm_pipeline.run()'s input contract
(doc_id, source, lang, text — plus the stage-4 source stats).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(
    docs_path: str | None = None,
    app_name: str = "mine-spark-ingest",
    skew_share_threshold_pct: float = 20.0,
    family_coeff_threshold: float = 0.5,
) -> dict:
    """Execute the ingest pipeline; returns per-stage survivor counts plus
    the final DataFrame under the 'docs' key and the stage-5 template-
    family audit under the 'review' key.

    `skew_share_threshold_pct`: if the key-skew audit shows the hottest
    source holding at least this share of surviving rows, the enrichment
    join (stage 4) salts; otherwise it runs plain.

    `family_coeff_threshold`: stage 5 routes a surviving doc to review
    when its clustering coefficient in the near-dup pair graph reaches
    this value (and degree >= 2) — triangles mean a template FAMILY the
    content dedups could not collapse; a coefficient of 0 on a positive
    degree is an isolated pairwise hit, left alone."""
    from pyspark.sql import functions as F

    from mine_database_spark.functions.text import strip_html
    from mine_database_spark.functions.urls import canonical_url
    from mine_database_spark.operators.dedup import normalized_dedup
    from mine_database_spark.session import get_spark

    spark = get_spark(app_name)
    spark.sparkContext.setLogLevel("ERROR")
    start = time.time()
    docs_path = docs_path or "/root/testdata/sf0.001/documents.parquet"
    counts: dict[str, object] = {}

    # 0. synthesize the crawl — three fetch classes, one per dedup stage:
    #    every doc's original fetch; a TRACKING-LINK refetch of every third
    #    doc (same resource, noisy URL -> canonical-URL dedup collapses it);
    #    and a SYNDICATED republication of every fourth doc (different host,
    #    reformatted text -> only normalized content dedup can collapse it)
    base = spark.read.parquet(docs_path).select("doc_id", "source", "lang", "text")
    html_of = lambda text: F.concat(
        F.lit("<html><body><!-- fetched --><h1>Title</h1><p>"),
        text,
        F.lit(
            "</p><script>track();</script>"
            "<div>footer &amp; legal — contact editor@site.example</div>"
            "</body></html>"
        ),
    )
    url_of = lambda host, noise: F.concat(
        F.lit(f"https://{host}"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit(".example.com/doc/"),
        (F.col("doc_id") % 1_000_000).cast("string"),
        F.lit(noise),
    )
    first = base.select(
        "doc_id", "source", "lang",
        html_of(F.col("text")).alias("html"),
        url_of("www.site", "").alias("fetch_url"),
        F.lit(0).alias("fetch_seq"),
    )
    tracking_refetch = base.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source", "lang",
        html_of(F.col("text")).alias("html"),
        url_of("WWW.Site", "/?utm_source=feed#top").alias("fetch_url"),
        F.lit(1).alias("fetch_seq"),
    )
    syndicated = base.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        "source", "lang",
        html_of(F.concat(F.lit("  "), F.col("text"), F.lit(" !!! "))).alias("html"),
        F.concat(
            F.lit("https://mirror.example.org/items/"),
            F.col("doc_id").cast("string"),
        ).alias("fetch_url"),
        F.lit(1).alias("fetch_seq"),
    )
    fetches = first.unionByName(tracking_refetch).unionByName(syndicated)
    counts["fetched"] = fetches.count()

    # 1. markup -> text (zero-shuffle regexp chain)
    fetches = fetches.withColumn("text", strip_html(F.col("html"))).drop("html")

    # 1b. PII pseudonymization BEFORE any content digesting: every email
    #     becomes a consistent sha256-keyed <EMAIL:token> (the same address
    #     maps to the same token corpus-wide), so downstream dedup keys and
    #     shipped text never carry raw addresses — another zero-shuffle
    #     scan fused into the same stage as extraction
    from mine_database_spark.functions.pii import pseudonymize_emails

    fetches = fetches.withColumn("text", pseudonymize_emails(F.col("text")))

    # 2. dedup by canonical URL: earliest fetch_seq (then doc_id) per key —
    #    min(struct) keeps the whole winning row without a second join
    keyed = fetches.withColumn("canonical", canonical_url(F.col("fetch_url")))
    survivors = (
        keyed.where(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(
            F.min(
                F.struct("fetch_seq", "doc_id", "source", "lang", "text")
            ).alias("w")
        )
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.source").alias("source"),
            F.col("w.lang").alias("lang"),
            F.col("w.text").alias("text"),
        )
    )
    counts["after_url_dedup"] = survivors.count()

    # 3. normalization-insensitive content dedup: reformatted republications
    #    that came through DIFFERENT urls still collapse
    keep = normalized_dedup(survivors).select(
        F.col("survivor_id").alias("doc_id")
    )
    docs = survivors.join(keep, "doc_id", "left_semi")
    counts["after_normalized_dedup"] = docs.count()

    # 4. source-reputation enrichment, skew-aware: 'source' is the canonical
    #    hot key of a crawl batch (one domain can dominate a fetch window),
    #    so the stage reads the key-skew audit FIRST and salts the join only
    #    when the hottest key's share crosses the threshold — the audit ->
    #    conditional-salt pattern from operators/skew.py as executable
    #    documentation. At this template's scale the stats dim would
    #    broadcast (and a broadcast join never has reduce-side skew); the
    #    salted branch is the shape for the 100 TB case where the dim is a
    #    per-domain table of millions of rows and the join must sort-merge.
    from mine_database_spark.operators.skew import key_skew_audit, salted_join

    top = key_skew_audit(docs, "source", top_n=1).collect()
    top_share = float(top[0]["share_pct"]) if top else 0.0
    counts["top_source_share_pct"] = top_share
    source_stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("source_docs"),
        F.round(F.avg(F.length("text")), 2).alias("source_avg_len"),
    )
    if top_share >= skew_share_threshold_pct:
        docs = salted_join(docs, source_stats, "source", n_salts=8)
        counts["enrich_join"] = "salted"
    else:
        docs = docs.join(source_stats, "source")
        counts["enrich_join"] = "plain"
    # 5. duplicate-cluster structure audit: stages 2-3 collapsed exact and
    #    reformatted copies; what survives can still share a TEMPLATE. LSH
    #    candidate pairs over the survivors form a graph — triangles are
    #    clustered duplication (a template family worth a human look),
    #    where a triangle-free pair is isolated noise. Wedges enumerate in
    #    degree order (triangle_count_deg), the skew-safe form: a template
    #    hub must not emit O(deg²) wedges. Docs with clustering coeff >=
    #    threshold and degree >= 2 route to review; the docs table itself
    #    is NOT filtered — routing is a curation decision downstream.
    from mine_database_spark.operators.dedup import minhash_lsh_dedup
    from mine_database_spark.operators.graph import triangle_count_deg

    pairs = minhash_lsh_dedup(docs.select("doc_id", "text"))
    tri = triangle_count_deg(pairs, src_col="a_id", dst_col="b_id")
    review = tri.where(
        (F.col("clustering_coeff") >= family_coeff_threshold)
        & (F.col("degree") >= 2)
    ).withColumnRenamed("node", "doc_id")
    counts["dup_candidate_pairs"] = pairs.count()
    counts["template_family_docs"] = review.count()
    counts["review"] = review

    # 6. binary-attachment routing: a crawl carries media blobs alongside
    #    markup. Decode is dep-gated (multimodal.py), but the decode-FREE
    #    tier runs today: a magic-prefix format census (which typed decoder
    #    queue each asset routes to) + byte-exact dedup so identical
    #    assets ship once. Step-0 synthesizes one asset per surviving doc —
    #    a format header varying by doc_id % 3 over a content slice, so
    #    both the census and the dedup see real structure; every fifth
    #    asset is re-fetched under a second id (the planted byte-identical
    #    duplicate the dedup must collapse).
    from mine_database_spark.operators.multimodal import binary_dedup, binary_profile

    header = F.when(F.col("doc_id") % 3 == 0, F.lit(b"\xff\xd8\xff\xe0")).otherwise(
        F.when(F.col("doc_id") % 3 == 1, F.lit(b"\x89PNG\r\n"))
        .otherwise(F.lit(b"RIFF"))
    )
    # payload = the full text bytes (a 64-char slice collided across docs:
    # extraction gives every doc the same "Title\n..." head)
    one = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.col("text").cast("binary")).alias("blob"),
    )
    assets = one.unionAll(
        one.where(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + 1000000).alias("media_id"), "blob"
        )
    )
    profile = binary_profile(assets)
    keep = binary_dedup(assets).where(F.col("keep"))
    counts["asset_formats"] = profile.count()
    counts["assets_unique"] = keep.count()
    counts["asset_profile"] = profile

    # 6b. byte-gram NEAR-dup collapse over the exact-dedup survivors: a
    #    re-fetched asset with a tracking trailer appended has a new
    #    sha256, so stage 6's exact tier ships it again — the byte-8-gram
    #    MinHash tier pairs it with its original before decode. Step-0
    #    plants exactly that: every seventh surviving asset re-fetched
    #    under a third id with a trailer; survivors = assets not the
    #    larger id of a near-dup pair (min-id survivor, the stage-6 rule).
    from mine_database_spark.operators.multimodal import binary_neardup

    # stage boundary: the survivors feed BOTH sides of 6b's union and then
    # binary_neardup's band SELF-join — without a checkpoint the lazy plan
    # (stages 1-5 + the dedup join-back) appears ~8x in the joined tree and
    # Catalyst constraint propagation goes combinatorial (the round-9
    # plan-growth class; measured: this stage alone held a driver thread
    # in getAllValidConstraints for 20+ minutes, vs seconds checkpointed)
    survivors = assets.join(
        keep.select("media_id"), "media_id", "left_semi"
    ).localCheckpoint(eager=True)
    refetched = survivors.where(F.col("media_id") % 7 == 0).select(
        (F.col("media_id") + 2000000).alias("media_id"),
        F.concat(F.col("blob"), F.lit(b"<trk:utm-trailer>")).alias("blob"),
    )
    tiered = survivors.unionAll(refetched)
    near_pairs = binary_neardup(tiered).where(F.col("est_jaccard") >= 0.5)
    near_losers = near_pairs.select(F.col("b_id").alias("media_id")).distinct()
    counts["asset_neardup_pairs"] = near_pairs.count()
    counts["assets_after_neardup"] = (
        tiered.join(near_losers, "media_id", "left_anti").count()
    )
    counts["asset_neardup"] = near_pairs

    counts["wall_seconds"] = round(time.time() - start, 1)
    counts["docs"] = docs
    return counts


if __name__ == "__main__":
    out = run()
    df = out.pop("docs")
    review = out.pop("review")
    for k, v in out.items():
        print(f"{k:24s} {v}")
    df.show(3, truncate=60)
    review.show(5, truncate=False)
