"""Full-text retrieval primitives over the documents table: inverted
index construction and BM25 ranking.

A training-data platform needs retrieval for curation (find documents
about X to up/down-weight), for decontamination forensics (which corpus
docs score highest against an eval question), and for RAG-style dataset
assembly. The reference has no text-retrieval surface (its searches are
mass/spectral — minedatabase/metabolomics.py:513-634); these extend the
engine the same way the dedup/quality families do (SURVEY.md §2.13).

Scale notes are per-function; the shared design rule: term statistics
(df, N, avgdl) are tiny aggregates that broadcast, the corpus token scan
happens exactly once per query, and nothing corpus-sized is collected or
cross-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mine_database_spark.functions.text import token_count, tokens


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Term -> posting-list index: (tok, df, postings) with postings the
    sorted distinct doc ids containing the term.

    `min_df` drops hapax/noise terms; `max_postings` truncates each list
    to its first N doc ids (ascending) — the stop-word guard: a term in
    half the corpus has a posting list O(corpus) long, and a single row
    holding it becomes the straggler. Production at 100 TB sets
    max_postings (or shards hot terms downstream); None keeps exact
    semantics for the oracle. `df` is always the EXACT document
    frequency (counted over the full posting set, never the cap).

    Scale: one explode scan + per-(tok, doc) distinct. Exact path: one
    groupBy(tok) whose df comes from the same aggregate (size of the
    set), not a second scan. Capped path: the posting list comes from a
    `row_number() over (partition by tok order by doc_id) <= N` filter
    BEFORE collect_set — Spark's WindowGroupLimit rewrite pushes a
    partial per-term top-N into each map task, so the hot term's
    reduce-side rows are O(N × maps), not O(corpus), and the aggregate
    buffer never holds more than N ids; df comes from a sibling
    map-side-combinable count on the same token-keyed exchange.
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    posting = docs.select(
        F.explode(tokens(F.col(text_col))).alias("tok"),
        F.col(id_col).alias("doc_id"),
    ).distinct()
    if max_postings is not None:
        if max_postings < 1:
            raise ValueError(f"max_postings must be >= 1, got {max_postings}")
        dfreq = posting.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("df")
        )
        w = Window.partitionBy("tok").orderBy("doc_id")
        capped = (
            posting.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_postings)
            .groupBy("tok")
            .agg(F.array_sort(F.collect_set("doc_id")).alias("postings"))
        )
        idx = dfreq.join(capped, "tok").select("tok", "df", "postings")
    else:
        idx = (
            posting.groupBy("tok")
            .agg(F.array_sort(F.collect_set("doc_id")).alias("postings"))
            .select(
                "tok",
                F.size("postings").cast("bigint").alias("df"),
                "postings",
            )
        )
    if min_df > 1:
        idx = idx.where(F.col("df") >= min_df)
    return idx


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25 (Robertson/
    Sparck Jones probabilistic ranking; the Lucene-default variant:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation k1, length
    normalization b against the mean document length).

    Returns (rank, doc_id, score) with score rounded to 4 decimals;
    ranking orders by the ROUNDED score (then doc_id) so the order is
    reproducible across engines whose ln() may differ in the last ulp.

    Scale: the corpus token scan is filtered to the query terms BEFORE
    the tf aggregate (explode -> isin -> groupBy), so the shuffled rows
    are O(docs containing a query term), not O(corpus tokens); document
    length is a row-local expression (token_count), not a second explode;
    df/N/avgdl are O(#terms)+O(1) aggregates joined broadcast. Global
    top-k is a sort-limit (TakeOrderedAndProject), never a full sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted(set(query_terms))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    # corpus stats: one map-side-combinable aggregate row, broadcast
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size("__toks")).alias("__avgdl"),
    )
    tf = (
        base.select("doc_id", F.size("__toks").alias("dl"), F.explode("__toks").alias("tok"))
        .where(F.col("tok").isin(terms))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    contrib = tf.join(F.broadcast(dfreq), "tok").crossJoin(F.broadcast(stats)).select(
        "doc_id", "tok", (idf * norm).alias("c")
    )
    # the per-doc score sums one double per matched term: summed in FIXED
    # sorted-term order via per-term conditional aggregates (there is one
    # row per (doc, tok), so max() selects it) — a float sum() would add
    # in partition order, breaking bit-reproducibility across partition
    # counts and engines
    per_term = [
        F.max(F.when(F.col("tok") == t, F.col("c"))).alias(f"__c{i}")
        for i, t in enumerate(terms)
    ]
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    scored = contrib.groupBy("doc_id").agg(*per_term).select(
        "doc_id", F.round(score, 4).alias("score")
    )
    # global top-k: sort-limit (TakeOrderedAndProject) does the heavy
    # selection; the rank window then orders only k rows
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "doc_id", "score"
    )


def hybrid_rrf(
    lexical: DataFrame,
    semantic: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top_k: int = 20,
) -> DataFrame:
    """Hybrid-retrieval fusion by Reciprocal Rank Fusion (Cormack et al.
    2009): given two ranked candidate lists — typically BM25 (lexical)
    and embedding-cosine (semantic) — each document scores
    Σ 1/(k_rrf + rank) over the lists it appears in; documents found by
    BOTH retrievers float to the top without ever comparing the two
    engines' incommensurable raw scores. This is the standard RAG
    retrieval composition (sparse + dense, fuse by rank).

    Determinism: each contribution is the exact integer
    1_000_000 div (k_rrf + rank) — integer division, no float whose
    last-ulp could reorder ties — and the fused rrf_ppm is an integer
    sum; `score` = rrf_ppm/1e6 rounded 6 derives from it.

    Returns top_k rows (doc_id, rank_lex, rank_sem, rrf_ppm, score,
    rank) by (rrf_ppm desc, doc_id); rank_lex / rank_sem are NULL when
    the doc appears in only one list.

    Scale: the inputs are already top-k lists — O(k) rows each — so the
    full-outer fusion join is trivially broadcastable and the cost lives
    entirely in the upstream rankers (bm25_topk's term-filtered scan,
    the ANN family's blocked/banded probes), each audited separately.
    k_rrf=60 is the published default; it flattens the head so one
    retriever's #1 cannot drown the other's consensus.
    """
    if k_rrf < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    lx = lexical.select(
        F.col(id_col).alias("doc_id"), F.col(rank_col).alias("rank_lex")
    )
    sm = semantic.select(
        F.col(id_col).alias("doc_id"), F.col(rank_col).alias("rank_sem")
    )
    fused = lx.join(sm, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(
                F.expr(f"1000000 div ({int(k_rrf)} + rank_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({int(k_rrf)} + rank_sem)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_ppm"),
    )
    top = fused.orderBy(F.desc("rrf_ppm"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        "rrf_ppm",
        F.round(F.col("rrf_ppm") / 1_000_000.0, 6).alias("score"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
