"""End-to-end run of examples/ingest_pipeline.py at sf0.001 — the crawl-side
ingest (markup extraction -> URL dedup -> normalized content dedup): each
dedup stage must collapse exactly its own synthesized fetch class, handing
llm_pipeline a clean table."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_ingest_pipeline_end_to_end(spark):
    from ingest_pipeline import run

    out = run()
    docs = out.pop("docs")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_base = base.count()
    n_track = base.where("doc_id % 3 = 0").count()
    n_synd = base.where("doc_id % 4 = 0").count()
    assert out["fetched"] == n_base + n_track + n_synd
    # canonical-URL dedup collapses the tracking refetches (same resource,
    # noisy URL) but CANNOT see the syndicated copies (different host)
    assert out["after_url_dedup"] == n_base + n_synd
    # normalized content dedup collapses the reformatted syndications
    assert out["after_normalized_dedup"] == n_base
    rows = docs.limit(5).collect()
    assert set(docs.columns) == {"doc_id", "source", "lang", "text"}
    # extraction really ran: markup and script bodies are gone
    for r in rows:
        assert "track();" not in r["text"]
        assert r["text"].startswith("Title\n")
        # pseudonymization ran: the planted footer address never survives,
        # and every doc carries the SAME consistent token for it
        assert "editor@site.example" not in r["text"]
        assert "<EMAIL:" in r["text"]
    toks = {r["text"].rsplit("<EMAIL:", 1)[1].split(">")[0] for r in rows}
    assert len(toks) == 1
    # the original fetch (fetch_seq 0, original doc_id) won every group
    assert docs.where("doc_id >= 1000000").count() == 0
