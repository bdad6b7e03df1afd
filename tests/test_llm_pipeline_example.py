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
