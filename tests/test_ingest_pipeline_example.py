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
    assert set(docs.columns) == {
        "doc_id", "source", "lang", "text", "source_docs", "source_avg_len",
    }
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
    # stage 4 ran and every row carries its source's stats
    assert out["enrich_join"] in ("plain", "salted")
    assert docs.where("source_docs IS NULL").count() == 0


def test_ingest_pipeline_routes_template_family_to_review(spark, tmp_path):
    """Stage 5: plant a TEMPLATE FAMILY (8 docs sharing one long template,
    each with a unique slug so the content dedups pass them through), one
    isolated near-dup PAIR, and solo filler. The LSH pair graph closes
    triangles only inside the family, so exactly the family routes to
    review — the pair (degree 1, coefficient 0) and the solos do not."""
    from ingest_pipeline import run

    # long template (~190 tokens): the per-doc slug perturbs only ~5 of
    # ~190 shingles, so every family pair's Jaccard is ~0.95 and all four
    # LSH bands collide deterministically (md5 is fixed) — a short
    # template left the clique incomplete when some band sigs diverged
    template = " ".join(
        f"section {w} of the syndicated quarterly template body repeats "
        f"verbatim across mirror sites with fixed boilerplate copy"
        for w in (
            "markets", "weather", "sports", "culture", "travel", "finance",
            "science", "politics", "health", "technology", "energy",
        )
    )
    rows = [
        (i, f"fam{i}.example", "en", f"{template} slug{i}") for i in range(8)
    ]
    pair_story = (
        "entirely different pairwise story about gardening tools and the "
        "seasonal catalogue of rakes shovels hoses and trowels for spring"
    )
    rows.append((20, "pairA.example", "en", f"{pair_story} variant one"))
    rows.append((21, "pairB.example", "en", f"{pair_story} variant two"))
    rows += [
        (i, f"solo{i}.example", "en",
         f"unique solitary document number {i} "
         + " ".join(f"tok{i}x{j}" for j in range(30)))
        for i in range(30, 40)
    ]
    src = str(tmp_path / "famdocs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(src)

    out = run(docs_path=src)
    docs = out.pop("docs")
    review = out.pop("review")
    assert out["after_normalized_dedup"] == len(rows)
    flagged = {r["doc_id"]: r for r in review.collect()}
    assert set(flagged) == set(range(8)), sorted(flagged)
    # the family is a full clique: every member saw all 7 others and
    # closed every wedge
    for r in flagged.values():
        assert r["degree"] == 7 and r["clustering_coeff"] == 1.0, r
    # LSH found the family clique (28 pairs) plus the isolated pair — which
    # closes no triangle and so never reaches review
    assert out["dup_candidate_pairs"] >= 28 + 1
    assert docs.count() == len(rows)


def test_ingest_pipeline_salts_on_planted_hot_key(spark, tmp_path):
    """Plant a corpus where one source dominates: the stage-4 audit must
    cross the threshold and pick the salted join, with row multiplicity
    and enrichment values identical to a plain join's."""
    from pyspark.sql import functions as F

    from ingest_pipeline import run

    # 60 docs from one hot source, 40 spread across 8 cold ones; unique
    # texts/ids so the dedup stages pass everything through
    rows = [
        (i, "hot.example" if i < 60 else f"cold{i % 8}.example", "en",
         f"unique document body number {i} with fill {'x' * (i % 7)}")
        for i in range(100)
    ]
    src = str(tmp_path / "hotdocs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(src)

    out = run(docs_path=src, skew_share_threshold_pct=50.0)
    docs = out.pop("docs")
    assert out["top_source_share_pct"] >= 50.0
    assert out["enrich_join"] == "salted"
    # salted join preserves plain-join semantics: one row per survivor,
    # stats equal the group's true count
    got = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.first("source_docs").alias("sd")
    ).collect()
    for r in got:
        assert r["n"] == r["sd"], r
    assert docs.count() == out["after_normalized_dedup"]
    # the same corpus under a high threshold takes the plain branch
    out2 = run(docs_path=src, skew_share_threshold_pct=90.0)
    assert out2["enrich_join"] == "plain"
    assert out2.pop("docs").count() == docs.count()


def test_ingest_pipeline_binary_asset_stage(spark):
    """Stage 6 routes synthesized media blobs: the format census sees the
    three planted magic prefixes (JPEG/PNG/RIFF), and byte-exact dedup
    collapses the planted re-fetches (every fifth asset duplicated under a
    second id) back to one copy each."""
    from pyspark.sql import functions as F

    from ingest_pipeline import run

    out = run()
    profile = out.pop("asset_profile")
    docs = out.pop("docs")
    out.pop("review")
    n_docs = docs.count()
    prof = {r["magic_hex"][:8]: r for r in profile.collect()}
    # the three planted headers are present (hex of the 4-byte prefix)
    assert "FFD8FFE0" in prof
    assert "89504E47" in prof  # \x89PNG
    assert any(k.startswith("52494646") for k in prof)  # RIFF
    # census covers every asset incl. the planted re-fetches
    assert sum(r["n_blobs"] for r in prof.values()) >= n_docs
    # dedup: unique assets = docs (each doc's blob is distinct; the planted
    # second-id re-fetches collapse)
    assert out["assets_unique"] == n_docs
    assert out["asset_formats"] == len(prof)
    # 6b near-dup tier: every planted trailer re-fetch (original id +
    # 2000000) pairs with its original at est_jaccard >= 0.5 and is
    # dropped — the exact tier CANNOT see these (new sha256)
    near = out.pop("asset_neardup")
    losers = {r["b_id"] for r in near.collect()}
    planted = {
        r["media_id"] + 2000000
        for r in docs.where(F.col("doc_id") % 7 == 0)
        .select(F.col("doc_id").alias("media_id"))
        .collect()
    }
    assert planted <= losers, planted - losers
    assert out["assets_after_neardup"] <= n_docs
    assert out["assets_after_neardup"] >= n_docs - out["asset_neardup_pairs"]
