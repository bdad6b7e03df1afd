"""End-to-end run of the examples/llm_pipeline.py template at sf0.001 —
the ingest -> dedup -> quality -> decontaminate -> rebalance -> chunk ->
shard pipeline must execute as one composition and every stage must be a
(non-strict) shrink of the corpus."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_llm_pipeline_end_to_end(spark, tmp_path):
    from llm_pipeline import run

    counts = run(out_dir=str(tmp_path / "shards"), source_cap=30)
    stages = [
        "ingested",
        "after_exact_dedup",
        "after_near_dedup",
        "after_segment_scrub",
        "after_span_scrub",
        "after_quality",
        "after_perplexity",
        "after_length_curation",
        "after_entropy",
        "after_decontamination",
        "after_mixture",
        "after_source_cap",
    ]
    vals = [counts[s] for s in stages]
    assert vals[0] > 0
    assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    # decontamination must actually have removed the planted eval overlap
    assert counts["after_decontamination"] < counts["after_quality"], counts
    assert counts["chunks"] >= counts["after_source_cap"] > 0
    assert counts["shards"] >= 1
    out = spark.read.parquet(counts["out_dir"])
    assert {"doc_id", "text", "shard_id"} <= set(out.columns)
    assert out.count() == counts["chunks"]
    # the closing corpus-health report ran and its signals are sane:
    # Zipf slope negative (frequencies decay with rank), diversity in
    # (0, 1], the p99 length estimate a positive power-of-two bound
    assert counts["audit_mean_zipf_slope"] < 0
    assert 0 < counts["audit_min_trigram_diversity"] <= 1.0
    assert counts["audit_max_top_share"] > 0
    assert counts["audit_max_p99_chars_bin_hi"] > 0
    # the KS length-shift gate ran: chunking rewrites every length, so
    # the shipped distribution must differ from the input (D > 0), and D
    # is a valid statistic (<= 1)
    assert 0 < counts["audit_length_ks_vs_input"] <= 1.0


def test_drift_report_planted_truncation_and_vocab_flood(spark):
    """Two planted corpus shifts must each surface in the right section of
    the cross-snapshot drift table: truncating half the docs moves the
    length-KS D stat (shape story); flooding new docs with one token puts
    that token at KL rank 1 (vocabulary story); an added + a removed doc
    land in the membership counts; and a planted embedding flip shows
    drift 2.0 for its group while the stable group reads ~0."""
    from pyspark.sql import functions as F

    from llm_pipeline import drift_report

    base = [
        (i, "alpha beta gamma delta epsilon zeta eta theta " * 6)
        for i in range(20)
    ]
    old = spark.createDataFrame(base, "doc_id long, text string")
    new_rows = []
    for i, text in base[1:]:  # doc 0 removed
        if i >= 10:
            text = text[:40]  # planted truncation
        if i % 3 == 0:
            text = text + " floodtoken" * 30  # planted vocab flood
        new_rows.append((i, text))
    new_rows.append((999, "a brand new document about nothing much"))
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    emb_old = spark.createDataFrame(
        [("g_stable", [1.0, 0.0]), ("g_flip", [0.0, 1.0])] * 3,
        "label string, embedding array<double>",
    )
    emb_new = spark.createDataFrame(
        [("g_stable", [1.0, 0.0]), ("g_flip", [0.0, -1.0])] * 3,
        "label string, embedding array<double>",
    )

    rows = drift_report(old, new, emb_old, emb_new).collect()
    got = {(r["section"], r["item"]): r["value"] for r in rows}

    assert got[("membership", "added")] == 1.0
    assert got[("membership", "removed")] == 1.0
    assert got[("membership", "changed")] >= 10.0  # truncated and/or flooded
    # truncation: old is a point mass at one length; 7 truncated-only docs
    # (40 chars) + the new doc (39) sit below it out of 20 -> D = 8/20
    assert got[("length_ks", "d_stat")] == 0.4
    # vocabulary: the flood token is KL rank 1 in the what-flooded-in
    # direction (it cannot rank in the old->new direction: KL weights
    # terms by the FIRST distribution, where the flood has count 0)
    kl_rank1 = max(
        (r for r in rows if r["section"] == "token_kl_new"),
        key=lambda r: abs(r["value"]),
    )
    assert kl_rank1["item"] == "floodtoken"
    assert any(r["section"] == "token_kl_gone" for r in rows)
    # embeddings: antipodal flip -> drift = 1 - (-1) = 2; stable group ~0
    assert got[("embedding", "g_flip")] == 2.0
    assert got[("embedding", "g_stable")] == 0.0
