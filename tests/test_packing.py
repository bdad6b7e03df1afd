"""Unit tests for the training-data shaping operators
(operators/packing.py, operators/dedup.py:incremental_dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mine_database_spark.operators import packing as pk
from mine_database_spark.operators.dedup import incremental_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# ---------------------------------------------------------------------------
# chunk_documents

def test_chunk_edges(spark):
    d = _docs(
        spark,
        [
            (1, "s", ""),  # empty -> no chunks
            (2, "s", "a b c"),  # 3 toks < 64 -> one chunk
            (3, "s", " ".join(f"t{i}" for i in range(65))),  # 65 toks -> 2 chunks
            (4, "s", " ".join(f"t{i}" for i in range(64))),  # exactly 64 -> 1 chunk
        ],
    )
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in pk.chunk_documents(d, chunk_size=64, stride=32).collect()
    }
    assert {k[0] for k in out} == {2, 3, 4}
    assert out[(2, 0)].n_toks == 3 and out[(2, 0)].chunk_text == "a b c"
    assert (3, 0) in out and (3, 1) in out and (3, 2) not in out
    assert out[(3, 1)].start_tok == 32 and out[(3, 1)].n_toks == 33
    assert out[(3, 1)].chunk_text.split() == [f"t{i}" for i in range(32, 65)]
    assert out[(4, 0)].n_toks == 64 and (4, 1) not in out


def test_chunk_overlap_stride(spark):
    d = _docs(spark, [(1, "s", " ".join(str(i) for i in range(10)))])
    rows = sorted(
        pk.chunk_documents(d, chunk_size=4, stride=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # n=10, size=4, stride=2 -> ceil(6/2)+1 = 4 chunks, starts 0,2,4,6
    assert [r.start_tok for r in rows] == [0, 2, 4, 6]
    assert rows[1].chunk_text == "2 3 4 5"
    assert all(r.n_toks == 4 for r in rows)


def test_chunk_stride_gt_size_no_empty_window(spark):
    # n=2, size=1, stride=2: the ceil formula alone would emit an empty
    # window at start=2 == n; the operator must drop it
    d = _docs(spark, [(1, "s", "a b")])
    rows = pk.chunk_documents(d, chunk_size=1, stride=2).collect()
    assert [(r.start_tok, r.n_toks, r.chunk_text) for r in rows] == [(0, 1, "a")]


def test_chunk_validation():
    with pytest.raises(ValueError):
        pk.chunk_documents(None, chunk_size=0)
    with pytest.raises(ValueError):
        pk.chunk_documents(None, stride=0)


# ---------------------------------------------------------------------------
# pack_greedy

def _ref_pack(sizes, capacity):
    bins, bin_id, fill, first = [], 0, 0, True
    for n in sizes:
        if first:
            fill, first = n, False
        elif fill + n <= capacity:
            fill += n
        else:
            bin_id += 1
            fill = n
        bins.append(bin_id)
    return bins


def test_pack_matches_reference_walk(spark):
    texts = ["a b c", "d e", "f g h i j k", "x", "y z w v u t s r q p", "m"]
    d = _docs(spark, [(i, "s1" if i % 2 else "s2", t) for i, t in enumerate(texts)])
    out = pk.pack_greedy(d, capacity=5, shard_col="source").collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard.setdefault(r.source, []).append(r)
    for shard, rows in by_shard.items():
        assert [r.bin_id for r in rows] == _ref_pack([r.n_toks for r in rows], 5), shard


def test_pack_oversize_gets_own_bin(spark):
    d = _docs(spark, [(1, "s", "a b"), (2, "s", " ".join("x" * 1 for _ in range(9))), (3, "s", "c")])
    rows = {r.doc_id: r for r in pk.pack_greedy(d, capacity=4).collect()}
    assert rows[1].bin_id == 0
    assert rows[2].bin_id == 1  # 9 toks > capacity: own bin
    assert rows[3].bin_id == 2  # next doc never joins an overflowed bin


def test_pack_capacity_invariant(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = pk.pack_greedy(docs, capacity=256).collect()
    fills = {}
    for r in out:
        fills.setdefault((r.source, r.bin_id), []).append(r.n_toks)
    for (_, _), sizes in fills.items():
        assert sum(sizes) <= 256 or len(sizes) == 1  # only oversize singletons exceed


def test_pack_validation():
    with pytest.raises(ValueError):
        pk.pack_greedy(None, capacity=0)


# ---------------------------------------------------------------------------
# temperature_sample

def test_temperature_alpha_one_keeps_all(spark):
    d = _docs(spark, [(i, f"s{i % 3}", "x") for i in range(30)])
    out = pk.temperature_sample(d, alpha=1.0, source_col="source")
    assert out.count() == 30
    assert out.select(F.min("keep_prob")).first()[0] == 1.0


def test_temperature_downsamples_dominant(spark):
    rows = [(i, "big" if i < 90 else "small", "x") for i in range(100)]
    out = pk.temperature_sample(_docs(spark, rows), alpha=0.5, source_col="source")
    probs = {r.source: r.keep_prob for r in out.select("source", "keep_prob").distinct().collect()}
    assert probs["small"] == 1.0  # rare domain capped at keep-everything
    assert 0 < probs["big"] < 1.0  # dominant domain down-sampled
    kept_big = out.where(F.col("source") == "big").count()
    assert kept_big < 90


def test_temperature_validation():
    with pytest.raises(ValueError):
        pk.temperature_sample(None, alpha=1.5)


# ---------------------------------------------------------------------------
# incremental_dedup

def test_incremental_equals_exact_anti_join(spark):
    corpus = _docs(spark, [(i, "c", f"text number {i}") for i in range(50)])
    # new batch: 10 dups of corpus rows + 10 genuinely new
    new = _docs(
        spark,
        [(100 + i, "n", f"text number {i}") for i in range(10)]
        + [(200 + i, "n", f"fresh text {i}") for i in range(10)],
    )
    for bucket_hex in (1, 2, 4):
        got = sorted(
            r.doc_id
            for r in incremental_dedup(new, corpus, bucket_hex=bucket_hex).collect()
        )
        assert got == [200 + i for i in range(10)], bucket_hex


def test_incremental_empty_corpus_keeps_all(spark):
    corpus = _docs(spark, []).where(F.lit(False))
    new = _docs(spark, [(1, "n", "a"), (2, "n", "b")])
    assert incremental_dedup(new, corpus).count() == 2


def test_incremental_validation(spark):
    with pytest.raises(ValueError):
        incremental_dedup(None, None, bucket_hex=0)


def test_stream_incremental_dedup(spark, tmp_path):
    """Stream-static anti-join dedup: a doc whose text already exists in
    the static corpus is dropped on arrival; new text passes through."""
    from mine_database_spark.streaming.windows import stream_incremental_dedup

    corpus = _docs(spark, [(100, "c", "seen before"), (101, "c", "also seen")])
    src = tmp_path / "dedup_src"
    src.mkdir()
    (src / "d.csv").write_text("1,seen before\n2,brand new text\n3,also seen\n4,another new\n")
    stream = spark.readStream.schema("doc_id long, text string").csv(str(src))
    q = (
        stream_incremental_dedup(stream, corpus)
        .writeStream.format("memory")
        .queryName("incr_dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow stream did not finish in 120s"
    got = sorted(r.doc_id for r in spark.sql("select * from incr_dedup_stream_test").collect())
    assert got == [2, 4]
    # stream-static anti-joins hold NO state store (that's why the operator
    # has no TTL knob, unlike exact_dedup_stream): pin statelessness so a
    # refactor to a stateful join can't silently start accumulating
    progresses = [p for p in q.recentProgress if p is not None]
    assert progresses, "no progress recorded"
    for p in progresses:
        assert not p["stateOperators"], p["stateOperators"]


# ---------------------------------------------------------------------------
# distributed_prefix_sum / token_budget_shards

def test_prefix_sum_matches_serial(spark):
    """The two-level distributed form must equal a serial walk — including
    negative values, ties broken by the unique key, and inputs that arrive
    in a scrambled partitioning."""
    rows = [(i, ((i * 7919) % 23) - 5) for i in range(200)]
    df = (
        spark.createDataFrame(rows, "k bigint, v bigint")
        .repartition(13)  # scramble: force the range exchange to do real work
    )
    out = pk.distributed_prefix_sum(df, "v", ["k"], cum_col="cum")
    got = {r.k: r.cum for r in out.collect()}
    acc, want = 0, {}
    for k, v in rows:
        acc += v
        want[k] = acc
    assert got == want


def test_prefix_sum_desc_order_and_num_partitions(spark):
    rows = [(i, i % 7 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    out = pk.distributed_prefix_sum(
        df, "v", [F.col("v").desc(), F.col("k").asc()], cum_col="cum", num_partitions=5
    )
    got = {r.k: r.cum for r in out.collect()}
    acc, want = 0, {}
    for k, v in sorted(rows, key=lambda t: (-t[1], t[0])):
        acc += v
        want[k] = acc
    assert got == want


def test_token_shards_matches_naive_global_window(spark):
    from pyspark.sql import Window

    d = _docs(
        spark,
        [(i, "s", " ".join("w" for _ in range((i * 13) % 29 + 1))) for i in range(120)],
    ).repartition(7)
    got = {
        r.doc_id: (r.n_toks, r.cum_toks, r.shard_id)
        for r in pk.token_budget_shards(d, budget=64).collect()
    }
    from mine_database_spark.functions.text import token_count

    sized = d.select("doc_id", token_count(F.col("text")).cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        r.doc_id: (r.n, r.cum, (r.cum - r.n) // 64)
        for r in sized.withColumn("cum", F.sum("n").over(w)).collect()
    }
    assert got == naive
    # every shard but the last starts at a multiple-of-budget boundary
    assert min(got[k][2] for k in got) == 0


def test_token_shards_validation(spark):
    with pytest.raises(ValueError):
        pk.token_budget_shards(_docs(spark, [(1, "s", "a")]), budget=0)


def test_distributed_ntile_matches_window_ntile(spark):
    """distributed_ntile must equal ntile(n) OVER (ORDER BY ...) exactly,
    across remainder shapes (T % n == 0, < n, > n cases) and T < n."""
    from pyspark.sql import Window

    for T, n in ((100, 10), (103, 10), (7, 10), (30, 4), (1, 3)):
        rows = [(i, (i * 37) % 1000) for i in range(T)]
        df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(5)
        got = {
            r.k: r.bucket
            for r in pk.distributed_ntile(df, n, [F.col("v"), F.col("k")]).collect()
        }
        w = Window.orderBy("v", "k")
        want = {
            r.k: r.b for r in df.select("k", F.ntile(n).over(w).alias("b")).collect()
        }
        assert got == want, (T, n)


def test_distributed_ntile_validation(spark):
    with pytest.raises(ValueError):
        pk.distributed_ntile(spark.range(3), 0, ["id"])


def test_stream_chunk_and_quality_score(spark, tmp_path):
    """chunk_documents and the quality classifier are stateless transforms,
    so they must run unchanged on a Structured Streaming source — the shape
    of an ingest-time shaping pipeline (score + chunk on arrival)."""
    from mine_database_spark.operators.quality import LogisticQualityClassifier

    src = tmp_path / "chunk_src"
    src.mkdir()
    (src / "d.csv").write_text(
        '1,"a b c d e f g h i j"\n2,"the cat sat on the mat and it is fine"\n3,""\n'
    )
    stream = spark.readStream.schema("doc_id long, text string").csv(str(src))

    q1 = (
        pk.chunk_documents(stream, chunk_size=4, stride=4)
        .writeStream.format("memory")
        .queryName("stream_chunks_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q1.awaitTermination(120), "chunk stream did not finish"
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in spark.sql("select * from stream_chunks_test").collect()
    }
    batch = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in pk.chunk_documents(
            spark.read.schema("doc_id long, text string").csv(str(src)),
            chunk_size=4,
            stride=4,
        ).collect()
    }
    assert got == batch and (1, 1) in got

    clf = LogisticQualityClassifier()
    q2 = (
        clf.transform(stream)
        .writeStream.format("memory")
        .queryName("stream_quality_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "quality stream did not finish"
    probs = {r.doc_id: r.quality_prob for r in spark.sql("select * from stream_quality_test").collect()}
    assert set(probs) == {1, 2, 3}
    assert probs[2] > probs[1]  # stopword-rich prose beats letter soup


def test_assign_splits_deterministic_and_stable(spark):
    """Hash-based split assignment: reproducible across calls, independent
    of partitioning, and STABLE under corpus growth (existing docs never
    move split when new docs arrive) — the resumability property."""
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id bigint")
    a = {r.doc_id: r.split for r in pk.assign_splits(docs).collect()}
    b = {r.doc_id: r.split for r in pk.assign_splits(docs.repartition(7)).collect()}
    assert a == b
    grown = spark.createDataFrame([(i,) for i in range(600)], "doc_id bigint")
    g = {r.doc_id: r.split for r in pk.assign_splits(grown).collect()}
    assert all(g[k] == v for k, v in a.items())
    # roughly the declared proportions, and salt decorrelates
    from collections import Counter
    c = Counter(g.values())
    assert c["train"] > c["val"] and c["train"] > c["test"] and set(c) == {"train", "val", "test"}
    s = {r.doc_id: r.split for r in pk.assign_splits(grown, salt="s2").collect()}
    assert s != g


def test_assign_splits_validation(spark):
    docs = spark.createDataFrame([(1,)], "doc_id bigint")
    with pytest.raises(ValueError):
        pk.assign_splits(docs, weights=())
    with pytest.raises(ValueError):
        pk.assign_splits(docs, weights=(("a", -1.0), ("b", 2.0)))


def test_pack_concat_matches_walk(spark):
    """pack_concat must concatenate exactly the pack_walk bins in doc
    order, with exact token totals."""
    d = _docs(
        spark,
        [(i, "s" if i % 2 else "t", " ".join(f"w{i}_{j}" for j in range((i % 5) + 1))) for i in range(20)],
    )
    out = {(r.source, r.bin_id): r for r in pk.pack_concat(d, capacity=6).collect()}
    rows = sorted(d.collect(), key=lambda r: r.doc_id)
    for shard in ("s", "t"):
        docs = [(r.doc_id, r.text) for r in rows if r.source == shard]
        bins = pk.pack_walk([len(t.split()) for _, t in docs], 6)
        expect: dict[int, list[str]] = {}
        for (did, text), b in zip(docs, bins):
            expect.setdefault(b, []).append(text)
        for b, texts in expect.items():
            got = out[(shard, b)]
            assert got.packed_text == " ".join(texts), (shard, b)
            assert got.n_docs == len(texts)
            assert got.n_toks == sum(len(t.split()) for t in texts)
    assert set(out) == {(s, b) for s in ("s", "t") for b in set(pk.pack_walk([len(t.split()) for _, t in [(r.doc_id, r.text) for r in rows if r.source == s]], 6))}


def test_empty_input_shaping_ops(spark):
    """Every shaping operator must return an empty result (same schema) on
    an empty corpus, not error."""
    empty = _docs(spark, []).where(F.lit(False))
    assert pk.chunk_documents(empty).count() == 0
    assert pk.pack_greedy(empty).count() == 0
    assert pk.pack_concat(empty).count() == 0
    assert pk.temperature_sample(empty).count() == 0
    assert pk.token_budget_shards(empty).count() == 0
    assert pk.distributed_ntile(empty.select("doc_id"), 10, ["doc_id"]).count() == 0
    assert pk.assign_splits(empty.select("doc_id")).count() == 0


def test_pack_greedy_nonstring_shard_and_string_ids(spark):
    """The Arrow output schema must derive from the input types: an int
    shard key and string doc ids pack without coercion errors."""
    d = spark.createDataFrame(
        [(f"d{i:02d}", i % 2, "w " * ((i % 3) + 1)) for i in range(10)],
        "doc_id string, source int, text string",
    )
    out = pk.pack_greedy(d, capacity=3).collect()
    assert {r.source for r in out} == {0, 1}
    assert all(isinstance(r.doc_id, str) for r in out)
    for shard in (0, 1):
        docs = sorted((r.doc_id, r.n_toks) for r in out if r.source == shard)
        assert [r.bin_id for r in sorted(out, key=lambda r: r.doc_id) if r.source == shard] == pk.pack_walk(
            [n for _, n in docs], 3
        )


def test_prefix_sum_payload_join_back(spark):
    """The payload path (frame wider than value+order): cum values must
    equal the naive global window, payload columns survive, and rows with
    NULL order keys are kept (null-safe join-back), not dropped."""
    rows = [(1, 10, "a"), (2, 20, "b"), (None, 5, "c"), (3, 1, "d")]
    df = spark.createDataFrame(rows, "k int, v int, payload string")
    out = {r["payload"]: r for r in
           pk.distributed_prefix_sum(df, "v", ["k"], cum_col="cum").collect()}
    assert len(out) == 4, sorted(out)
    # NULLS FIRST in ascending range order: c(5), a(15), b(35), d(36)
    assert out["c"]["cum"] == 5
    assert out["a"]["cum"] == 15 and out["b"]["cum"] == 35 and out["d"]["cum"] == 36
    assert out["a"]["k"] == 1 and out["c"]["k"] is None


def test_mixture_upsample_counts_and_determinism(spark):
    """floor(f) copies guaranteed, frac(f) as a deterministic Bernoulli:
    every doc with f=2.5 emits 2 or 3 copies; re-runs are bit-identical;
    f<1 behaves as a keep-rate; unmapped sources take the default; epoch
    numbering is 1..n_copies."""
    from mine_database_spark.operators.packing import mixture_upsample

    docs = spark.createDataFrame(
        [(i, "wiki" if i % 2 == 0 else ("crawl" if i % 3 == 0 else "misc"))
         for i in range(200)],
        "doc_id long, source string",
    )
    out = mixture_upsample(docs, {"wiki": 2.5, "crawl": 0.4}, default_factor=1.0)
    rows = out.collect()
    again = mixture_upsample(docs, {"wiki": 2.5, "crawl": 0.4}, default_factor=1.0).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    per = {}
    for r in rows:
        per.setdefault((r["doc_id"], r["source"]), []).append(r["epoch"])
        assert r["n_copies"] == max(per[(r["doc_id"], r["source"])]) or True
    for (did, src), epochs in per.items():
        assert sorted(epochs) == list(range(1, len(epochs) + 1)), (did, epochs)
        if src == "wiki":
            assert len(epochs) in (2, 3)
        elif src == "crawl":
            assert len(epochs) == 1  # survivors of the 0.4 keep-rate
        else:
            assert len(epochs) == 1
    wiki_ids = {i for i in range(200) if i % 2 == 0}
    wiki_copies = sum(len(per[(i, "wiki")]) for i in wiki_ids)
    assert 2.2 * len(wiki_ids) < wiki_copies < 2.8 * len(wiki_ids)
    crawl_ids = {i for i in range(200) if i % 2 and i % 3 == 0}
    kept_crawl = sum(1 for i in crawl_ids if (i, "crawl") in per)
    assert 0 < kept_crawl < len(crawl_ids)  # some dropped by the 0.4 rate
