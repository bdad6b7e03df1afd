"""Property-based tests (hypothesis) over the pure-Python kernel functions.

The reference ships only example-based tests (SURVEY §5 "not present:
property-based/randomized"); these pin the algebraic invariants the engine's
correctness rests on — identity hashing, sanitization idempotence, rule
application — without spinning Spark per example.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mine_database_spark.chem.fake import FakeChemBackend
from mine_database_spark.operators.expansion import compound_id

B = FakeChemBackend()

smiles_text = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="."),
    min_size=1,
    max_size=40,
)


@given(smiles_text)
@settings(max_examples=200)
def test_inchi_key_shape_and_determinism(s):
    k1, k2 = B.inchi_key(s), B.inchi_key(s)
    assert k1 == k2
    assert re.fullmatch(r"[A-Z]{14}-[A-Z]{10}-N", k1)


@given(smiles_text)
@settings(max_examples=200)
def test_compound_id_uses_structure_block_only(s):
    """Identity is the first InChIKey block (utils.py:115-164): ids must agree
    for keys sharing the block and differ by declared type prefix."""
    key = B.inchi_key(s)
    block = key.split("-")[0]
    assert compound_id(key) == compound_id(block + "-ZZZZZZZZZZ-M")
    assert compound_id(key, "Coreactant")[0] == "X"
    assert compound_id(key, "Target Compound")[0] == "T"
    assert compound_id(key)[0] == "C"
    assert compound_id(key)[1:] == compound_id(key, "Coreactant")[1:]


@given(smiles_text)
@settings(max_examples=200)
def test_neutralize_idempotent(s):
    n = B.neutralize(s)
    assert "+" not in n and "-" not in n
    assert B.neutralize(n) == n


@given(smiles_text)
@settings(max_examples=200)
def test_atom_count_is_alpha_multiset(s):
    counts = B.atom_count(s)
    assert sum(counts.values()) == sum(c.isalpha() for c in s)
    assert all(k.isupper() and v > 0 for k, v in counts.items())
    assert B.formula(s) == B.formula(s)


@given(smiles_text)
@settings(max_examples=200)
def test_fingerprint_sorted_unique_bounded(s):
    fp = B.fingerprint(s)
    assert fp == sorted(set(fp))
    assert all(0 <= b < 512 for b in fp)


def test_compile_rule_splits_on_first_arrow():
    assert B.compile_rule("ab>>cd") == ("ab", "cd")
    assert B.compile_rule("a>>c>>d") == ("a", "c>>d")


@given(smiles_text, smiles_text, smiles_text)
@settings(max_examples=200)
def test_run_reaction_enumerates_every_match_position(sub, pat, repl):
    """One product set per (overlapping) occurrence of the pattern, each the
    substrate rewritten at that position — RunReactants attachment-point
    semantics (reference reactions.py:44-220). The compiled form is the
    (pat, repl) tuple; rule-string parsing is covered separately."""
    out = B.run_reaction((pat, repl), [sub])
    occurrences = []
    start = 0
    while True:
        i = sub.find(pat, start)
        if i < 0:
            break
        occurrences.append(i)
        start = i + 1
    assert len(out) == len(occurrences)
    for pos, products in zip(occurrences, out):
        assert products == [sub[:pos] + repl + sub[pos + len(pat):]]


@given(
    dgf=st.lists(st.floats(-500, 500), min_size=1, max_size=4),
    n_h=st.lists(st.integers(0, 10), min_size=1, max_size=4),
    z=st.lists(st.integers(-3, 3), min_size=1, max_size=4),
    ph=st.floats(0, 14),
    ii=st.floats(0, 1),
)
@settings(max_examples=60, deadline=None)
def test_dg_scorer_antisymmetry_and_ph_monotonicity(dgf, n_h, z, ph, ii):
    """ΔG′(A=>B) == −ΔG′(B=>A) for any table/conditions, and for a
    net-proton-producing direction the ΔG′ rises linearly with pH at
    RTln10 per proton (the Legendre transform, exactly)."""
    from mine_database_spark.operators.heavy_filters import GroupContributionDGScorer

    m = min(len(dgf), len(n_h), len(z))
    names = [f"M{i}" for i in range(m)]
    table = {names[i]: (dgf[i], n_h[i], z[i]) for i in range(m)}
    s = GroupContributionDGScorer(table=table, p_h=ph, ionic_strength=ii)
    lhs, rhs = names[0], " + ".join(names[1:]) or names[0]
    fwd, rev = s(f"{lhs} => {rhs}"), s(f"{rhs} => {lhs}")
    assert abs(fwd + rev) < 1e-6

    s2 = GroupContributionDGScorer(table=table, p_h=ph + 1.0, ionic_strength=ii)
    net_h = sum(table[n][1] for n in ([rhs] if rhs == names[0] else names[1:])) - table[lhs][1]
    expect_delta = net_h * GroupContributionDGScorer.RT_LN10
    assert abs((s2(f"{lhs} => {rhs}") - fwd) - expect_delta) < 1e-6


def test_reaction_hash_order_invariant(spark):
    """'R'+sha256 equation hash must not depend on array order
    (utils.py:324-379 canonical sort semantics)."""
    from pyspark.sql import functions as F

    from mine_database_spark.operators.expansion import canonical_rxn_hash_col

    rows = [
        ([(1, "Ca"), (2, "Cb")], [(1, "Cc")]),
        ([(2, "Cb"), (1, "Ca")], [(1, "Cc")]),
    ]
    df = spark.createDataFrame(
        rows,
        "reactants array<struct<stoich:int,c_id:string>>, products array<struct<stoich:int,c_id:string>>",
    )
    hashes = [r[0] for r in df.select(canonical_rxn_hash_col(F.col("reactants"), F.col("products"))).collect()]
    assert hashes[0] == hashes[1]


# ---------------------------------------------------------------------------
# Training-data shaping kernels (operators/packing.py) — pure-Python walks
# shared with the Spark operators, so every invariant pinned here holds for
# the distributed form too.

from mine_database_spark.operators.packing import chunk_starts, pack_walk


@given(st.lists(st.integers(min_value=0, max_value=500), max_size=60),
       st.integers(min_value=1, max_value=300))
@settings(max_examples=300)
def test_pack_walk_invariants(sizes, capacity):
    bins = pack_walk(sizes, capacity)
    assert len(bins) == len(sizes)
    if not bins:
        return
    # bin ids start at 0 and advance by at most 1
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # capacity: a bin exceeds it only as an oversize singleton
    fills: dict[int, list[int]] = {}
    for n, b in zip(sizes, bins):
        fills.setdefault(b, []).append(n)
    for members in fills.values():
        assert sum(members) <= capacity or len(members) == 1
    # greediness: every new bin was forced — the previous bin could not
    # have taken the next bin's first item
    for i in range(1, len(bins)):
        if bins[i] != bins[i - 1]:
            assert sum(fills[bins[i - 1]]) + sizes[i] > capacity


@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=1, max_value=200),
       st.integers(min_value=1, max_value=200))
@settings(max_examples=300)
def test_chunk_starts_invariants(n, chunk_size, stride):
    starts = chunk_starts(n, chunk_size, stride)
    if n == 0:
        assert starts == []
        return
    assert starts[0] == 0
    # strictly increasing by exactly `stride`
    assert all(b - a == stride for a, b in zip(starts, starts[1:]))
    # every start lands inside the document — no empty windows, ever
    assert starts[-1] < n
    # overlapping/tiling windows (stride <= chunk_size) must reach the end,
    # and the window BEFORE the last must not already cover the document
    if stride <= chunk_size:
        assert starts[-1] + chunk_size >= n
        if len(starts) > 1:
            assert starts[-2] + chunk_size < n
    # full coverage when windows overlap or tile (stride <= chunk_size)
    if stride <= chunk_size:
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + chunk_size, n)))
        assert covered == set(range(n))


# ---------------------------------------------------------------------------
# shaping kernels: NTILE arithmetic and quality features

@given(st.integers(min_value=0, max_value=400), st.integers(min_value=1, max_value=23))
@settings(max_examples=200)
def test_ntile_formula_matches_sql_semantics(T, n):
    """The integer formula distributed_ntile evaluates (size/extra/cut per
    rank) must equal SQL NTILE: first T % n buckets hold T//n + 1 rows."""
    size, extra = T // n, T % n
    cut = extra * (size + 1)
    # reference: explicit bucket sizes
    sizes = [size + 1] * extra + [size] * (n - extra)
    ref = []
    for b, width in enumerate(sizes, start=1):
        ref.extend([b] * width)
    got = []
    for r in range(1, T + 1):
        if r <= cut:
            b = (r - 1) // (size + 1) + 1
        else:
            b = extra + (r - cut - 1) // max(size, 1) + 1
        got.append(b)
    assert got == ref


@given(st.text(alphabet=st.characters(min_codepoint=9, max_codepoint=591), max_size=80))
@settings(max_examples=300)
def test_quality_features_invariants(text):
    from mine_database_spark.operators.quality import _features_py

    f = _features_py(text)
    assert 0.0 <= f["len_score"] <= 1.0
    assert 0.0 <= f["stopword_ratio"] <= 1.0
    assert 0.0 <= f["upper_ratio"] <= 1.0
    assert 0.0 <= f["digit_ratio"] <= 1.0
    assert f["avg_token_len"] >= 0.0
    # empty-token texts zero every ratio (ASCII whitespace rule: NBSP etc.
    # are token characters, matching the JVM side)
    if not re.findall(r"\S+", text, flags=re.ASCII):
        assert all(v == 0.0 for v in f.values())
