"""Metabolomics layer + readers/writers tests (SURVEY §3.2/§3.3, §2.1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mine_database_spark.schemas import ADDUCT_SCHEMA, CORE_COMPOUND_SCHEMA, PEAK_SCHEMA


@pytest.fixture(scope="module")
def peaks(spark):
    rows = [
        ("p1", 5.0, 427.0294, "+", None, [(100.0, 1.0), (200.0, 0.5)]),
        ("p2", 7.0, 100.1, "+", None, []),
    ]
    return spark.createDataFrame(rows, PEAK_SCHEMA)


@pytest.fixture(scope="module")
def adducts(spark):
    # [M+H]+ : mass_mult 1, ion_mass 1.007276 (reference adduct file shape)
    rows = [("[M+H]+", 1.0, 1.007276, "+"), ("[M+Na]+", 1.0, 22.989218, "+")]
    return spark.createDataFrame(rows, ADDUCT_SCHEMA)


@pytest.fixture(scope="module")
def core(spark):
    rows = [
        ("Caaa", "mol1", "IK1", 426.022124, 0, "C10", 1.0, [1, 2], ["m"]),
        ("Cbbb", "mol2", "IK2", 426.022, 0, "C9", 0.5, [3], ["m"]),
        ("Cccc", "mol3", "IK3", 99.09, 0, "C2", 0.1, [4], ["m"]),
        ("Cddd", "mol4", "IK4", 500.0, 0, "C50", 2.0, [5], ["m"]),
    ]
    return spark.createDataFrame(rows, CORE_COMPOUND_SCHEMA)


def test_adduct_math_golden(spark, peaks, adducts):
    """Adduct mass arithmetic golden (test_metabolomics.py:125-140):
    mz 427.0294 [M+H]+ → neutral mass 426.022124 ± tol."""
    from mine_database_spark.operators.metabolomics import adduct_windows

    w = adduct_windows(peaks, adducts, tolerance=0.001)
    row = [r for r in w.collect() if r["peak_id"] == "p1" and r["adduct_name"] == "[M+H]+"][0]
    assert abs((row["lo"] + row["hi"]) / 2 - 426.022124) < 1e-9
    assert abs((row["hi"] - row["lo"]) / 2 - 0.001) < 1e-12  # absolute Da mode

    # relative mode mirrors the reference formula tol/1e5 * mass exactly
    # (metabolomics.py:213-214 — documented quirk: /1e5, not /1e6)
    wp = adduct_windows(peaks, adducts, tolerance=5.0, ppm=True)
    rp = [r for r in wp.collect() if r["peak_id"] == "p1" and r["adduct_name"] == "[M+H]+"][0]
    assert abs((rp["hi"] - rp["lo"]) / 2 - (5.0 / 100000.0) * 426.022124) < 1e-9


def test_find_db_hits_range_join(spark, peaks, adducts, core):
    from mine_database_spark.operators.metabolomics import find_db_hits

    hits = find_db_hits(peaks, adducts, core, tolerance=0.001)
    got = {(r["peak_id"], r["_id"]) for r in hits.collect()}
    assert ("p1", "Caaa") in got and ("p1", "Cbbb") in got
    assert not any(cid == "Cddd" for _, cid in got)


def test_find_db_hits_bucketed_equals_bnlj(spark, peaks, adducts, core):
    """The SURVEY §4 bucketed equi-join twin must return exactly the BNLJ
    form's rows — in Da mode, ppm mode, with the halogen filter, and for
    windows that straddle a bucket boundary — with no BNLJ in its plan."""
    from mine_database_spark.operators.metabolomics import find_db_hits, find_db_hits_bucketed

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for kw in (
        dict(tolerance=0.001),
        dict(tolerance=5.0, ppm=True),
        dict(tolerance=0.05, halogen_filter=True),
        # window [426.021, 426.023] straddles the floor(mass/1e-3) boundary
        dict(tolerance=0.001, bucket_width=0.001),
        # absurdly wide window → many buckets per window, still exact
        dict(tolerance=40.0, bucket_width=0.5),
    ):
        hkw = {k: v for k, v in kw.items() if k != "bucket_width"}
        assert rows(find_db_hits_bucketed(peaks, adducts, core, **kw)) == rows(
            find_db_hits(peaks, adducts, core, **hkw)
        ), kw

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_width"):
        find_db_hits_bucketed(peaks, adducts, core, bucket_width=0.0)


def test_spectral_scoring(spark):
    from mine_database_spark.operators.metabolomics import spectral_scores

    rows = [
        ("p1", "Caaa", [{"mz": 100.0, "intensity": 1.0}, {"mz": 200.0, "intensity": 0.5}]),
        ("p1", "Cbbb", [{"mz": 300.0, "intensity": 1.0}]),
    ]
    df = spark.createDataFrame(rows, "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>")
    scored = spectral_scores(df, [(100.0, 1.0), (200.0, 0.5)], metric="dot")
    res = {r["_id"]: (r["score"], r["rank"]) for r in scored.collect()}
    assert res["Caaa"][0] == 1.0 and res["Caaa"][1] == 1  # perfect match ranks first
    assert res["Cbbb"][0] == 0.0


def test_spectral_scoring_reference_vectors(spark):
    """X9/X11 exact parity vectors (reference
    tests/test_unit/test_metabolomics.py:197-222): dot=0.90909 and
    jaccard=0.5 for the same spectra pair at ε=0.01."""
    from mine_database_spark.operators.metabolomics import spectral_scores

    y = [{"mz": 10.011, "intensity": 10.0}, {"mz": 20.009, "intensity": 300.0},
         {"mz": 25.0, "intensity": 100.0}]
    df = spark.createDataFrame(
        [("p1", "Cy", y)],
        "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>",
    )
    x = [(10.0, 100.0), (20.0, 300.0), (25.0, 10.0)]
    dot = spectral_scores(df, x, metric="dot", tolerance=0.01).collect()[0]["score"]
    assert round(dot, 5) == 0.90909
    jac = spectral_scores(df, x, metric="jaccard", tolerance=0.01).collect()[0]["score"]
    assert jac == 0.5


def test_spectral_jaccard_zero_intensity_and_strict_epsilon(spark):
    """Two reference quirks pinned (metabolomics.py:455-457, 504):
    a matched pair counts toward jaccard only when BOTH intensities are
    truthy, and the ε comparison is STRICT (diff == ε is NOT a match)."""
    from mine_database_spark.operators.metabolomics import spectral_scores

    y = [{"mz": 10.0, "intensity": 0.0}, {"mz": 20.0, "intensity": 5.0}]
    df = spark.createDataFrame(
        [("p1", "Cz", y)],
        "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>",
    )
    # 10.0 aligns but has zero intensity on one side → excluded from the
    # count; 20.0 counts → jaccard = 1 / (2 + 2 - 1)
    jac = spectral_scores(df, [(10.0, 3.0), (20.0, 4.0)], metric="jaccard").collect()[0]["score"]
    assert jac == round(1 / 3, 6)
    # diff exactly == ε: reference matches on difference < epsilon only
    jac2 = spectral_scores(df, [(19.99, 4.0)], metric="jaccard", tolerance=0.01).collect()[0][
        "score"
    ]
    assert jac2 == 0.0
    dot2 = spectral_scores(df, [(19.99, 4.0)], metric="dot", tolerance=0.01).collect()[0]["score"]
    assert dot2 == 0.0


def test_spectral_fast_path_matches_greedy_walk(spark):
    """The searchsorted fast path and the greedy-walk fallback must agree
    with a pure-python twin of the reference's _approximate_matches on
    random spectra — including clusters tighter than 2ε (which force the
    fallback) and zero intensities."""
    import numpy as np

    from mine_database_spark.operators.metabolomics import spectral_scores

    eps = 0.01

    def ref_scores(q, s):
        # reference metabolomics.py:404-514 semantics, verbatim walk
        q, s = sorted(q), sorted(s)
        ai = bi = dot = n_match = 0
        while ai < len(q) and bi < len(s):
            d = q[ai][0] - s[bi][0]
            if abs(d) < eps:
                dot += q[ai][1] * s[bi][1]
                if q[ai][1] and s[bi][1]:
                    n_match += 1
                ai += 1
                bi += 1
            elif d < 0:
                ai += 1
            else:
                bi += 1
        na = sum(i * i for _, i in q) ** 0.5
        nb = sum(i * i for _, i in s) ** 0.5
        cos = dot / (na * nb) if na and nb else 0.0
        jac = n_match / (len(q) + len(s) - n_match) if q or s else 0.0
        return round(cos, 6), round(jac, 6)

    rng = np.random.default_rng(7)
    query = sorted(
        (float(m), float(i))
        for m, i in zip(rng.uniform(10, 10.5, 12), rng.choice([0.0, 1.0, 5.0], 12))
    )
    rows = []
    for j in range(60):
        n = int(rng.integers(0, 15))
        # mz clustered into ~0.5 Da so many peaks sit within 2ε of each other
        spec = [
            {"mz": float(m), "intensity": float(i)}
            for m, i in zip(sorted(rng.uniform(10, 10.5, n)), rng.choice([0.0, 1.0, 3.0], n))
        ]
        rows.append((f"p{j}", f"C{j}", spec))
    df = spark.createDataFrame(
        rows, "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>"
    )
    got_dot = {
        r["_id"]: r["score"] for r in spectral_scores(df, query, metric="dot", tolerance=eps).collect()
    }
    got_jac = {
        r["_id"]: r["score"]
        for r in spectral_scores(df, query, metric="jaccard", tolerance=eps).collect()
    }
    for pid, cid, spec in rows:
        s = [(p["mz"], p["intensity"]) for p in spec]
        exp_dot, exp_jac = ref_scores(list(query), s)
        assert got_dot[cid] == exp_dot, (cid, got_dot[cid], exp_dot)
        assert got_jac[cid] == exp_jac, (cid, got_jac[cid], exp_jac)

    # Second scenario: a WIDE-gap query (all gaps >= 2ε) so the batched
    # unambiguous short-circuit actually fires, mixed in one batch with
    # clustered rows that must still take the walk. Covers: exact matches,
    # near-misses at ±ε boundaries, query peaks beyond both spectrum ends,
    # zero intensities on either side, and single-peak/empty spectra.
    wide_query = [(10.0 + 0.2 * k, float(k % 3)) for k in range(12)]
    rows2 = []
    for j in range(60):
        n = int(rng.integers(0, 15))
        if j % 2 == 0:  # unambiguous: gaps ~0.1 >> 2ε
            mzs = sorted(10.05 + 0.1 * k + float(rng.uniform(-0.004, 0.004)) for k in range(n))
        else:  # ambiguous: tight cluster forces the walk for this row
            mzs = sorted(rng.uniform(10.0, 10.3, n))
        spec = [
            {"mz": float(m), "intensity": float(i)}
            for m, i in zip(mzs, rng.choice([0.0, 1.0, 3.0], n))
        ]
        rows2.append((f"w{j}", f"W{j}", spec))
    df2 = spark.createDataFrame(
        rows2, "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>"
    )
    got_dot2 = {
        r["_id"]: r["score"]
        for r in spectral_scores(df2, wide_query, metric="dot", tolerance=eps).collect()
    }
    got_jac2 = {
        r["_id"]: r["score"]
        for r in spectral_scores(df2, wide_query, metric="jaccard", tolerance=eps).collect()
    }
    for pid, cid, spec in rows2:
        s = [(p["mz"], p["intensity"]) for p in spec]
        exp_dot, exp_jac = ref_scores(list(wide_query), s)
        assert got_dot2[cid] == exp_dot, (cid, got_dot2[cid], exp_dot)
        assert got_jac2[cid] == exp_jac, (cid, got_jac2[cid], exp_jac)

    # Third scenario: every m/z on an ε/2 lattice, so |Δ| lands EXACTLY on
    # the strict-< boundaries (0, ε/2, ε, 3ε/2) and consecutive gaps land
    # exactly on the 2ε fast-path eligibility boundary. Mixed unambiguous
    # and ambiguous rows; path choice may differ row to row but scores must
    # be bit-identical to the walk either way.
    # query gaps are 5 lattice steps (0.025 > 2ε robustly): 4-step gaps
    # round a hair BELOW 2ε in doubles and would demote the whole batch to
    # the walk (conservative, still exact — subtraction of nearby doubles
    # is exact by Sterbenz, so eligibility never overclaims); spectra keep
    # arbitrary lattice gaps so per-row eligibility straddles the boundary
    grid_query = [(10.0 + 0.005 * k, 1.0) for k in (0, 5, 10, 15, 25, 35)]
    rows3 = []
    for j in range(80):
        n = int(rng.integers(1, 10))
        ks = sorted(rng.choice(40, size=n, replace=False))
        spec = [
            {"mz": 10.0 + 0.005 * int(k), "intensity": float(i)}
            for k, i in zip(ks, rng.choice([0.0, 1.0, 2.0], n))
        ]
        rows3.append((f"g{j}", f"G{j}", spec))
    df3 = spark.createDataFrame(
        rows3, "peak_id string, _id string, spectra array<struct<mz:double,intensity:double>>"
    )
    for metric in ("dot", "jaccard"):
        got3 = {
            r["_id"]: r["score"]
            for r in spectral_scores(df3, grid_query, metric=metric, tolerance=eps).collect()
        }
        for pid, cid, spec in rows3:
            s = [(p["mz"], p["intensity"]) for p in spec]
            exp = ref_scores(list(grid_query), s)[0 if metric == "dot" else 1]
            assert got3[cid] == exp, (metric, cid, got3[cid], exp)


def test_score_compounds(spark, peaks, adducts, core):
    from mine_database_spark.operators.metabolomics import find_db_hits, score_compounds

    hits = find_db_hits(peaks, adducts, core)
    native = spark.createDataFrame([("Caaa",)], "_id string")
    scored = score_compounds(hits, native)
    res = {r["_id"]: r["compound_score"] for r in scored.collect()}
    assert res["Caaa"] == 0.75
    assert res["Cbbb"] == 0.0


def test_rules_readers(spark, tmp_path):
    from mine_database_spark.sources.readers import (
        read_coreactants_tsv,
        read_rules_tsv,
        rules_fraction_coverage,
        rules_top_n,
    )

    rules_file = tmp_path / "rules.tsv"
    rules_file.write_text(
        "Name\tReactants\tSMARTS\tProducts\tComments\tCounts\n"
        "# a comment line\n"
        "r1\tATP;Any\tab>>cd\tAny;ADP\t\t10\n"
        "r2\tAny\tq>>z\tAny\t\t5\n"
        "r3\tAny\tz>>q\tAny\t\t1\n"
    )
    df, rules = read_rules_tsv(spark, str(rules_file))
    assert len(rules) == 3
    assert rules[0].reactant_roles == ["ATP", "Any"]
    assert rules_top_n(df, 2).count() == 2
    cov = rules_fraction_coverage(df, 0.9)
    assert [r["name"] for r in cov.orderBy("name").collect()] == ["r1", "r2"]

    co_file = tmp_path / "co.tsv"
    co_file.write_text("# comment\nATP\tatp\tatp\nADP\tadp\tadp\n")
    co = read_coreactants_tsv(spark, str(co_file))
    assert set(co) == {"ATP", "ADP"}
    assert co["ATP"][1].startswith("X")


def test_compound_hash_blocks_and_wildcards():
    """X1 parity vectors (reference tests/test_unit/test_utils.py:18-50 —
    sha1 over InChIKey blocks needs no chemistry): 1-block vs 2-block
    hashing and the wildcard-SMILES fallback."""
    from mine_database_spark.operators.expansion import compound_id

    ik = "LFQSCWFLJHTTHZ-UHFFFAOYSA-N"  # ethanol
    assert compound_id(ik, "Coreactant") == "Xa41fe8492d86f214ba494e3d04da2f0854c0e2ea"
    assert compound_id(ik, "Predicted") == "Ca41fe8492d86f214ba494e3d04da2f0854c0e2ea"
    ik2 = "WQZGKKKJIJFFOK-DVKNGEFBSA-N"  # glucose
    assert compound_id(ik2, "Starting Compound", inchi_blocks=2) == (
        "Cf95a3c17f908e427c3127b4e8c3d8575c286d6ce"
    )
    assert compound_id(ik2, "Starting Compound", inchi_blocks=1) == (
        "C9ab1a08d72c90a8167d1f3a668d8f1138e534a07"
    )
    # wildcard SMILES hash the raw SMILES, whatever the inchi key says
    import hashlib

    w = compound_id("IGNORED-KEY-N", "Predicted", smiles="CC(*)O")
    assert w == "C" + hashlib.sha1(b"CC(*)O").hexdigest()
    # no wildcard → smiles param is inert
    assert compound_id(ik, "Predicted", smiles="CCO") == compound_id(ik, "Predicted")


def test_compound_list_json(spark, tmp_path):
    """S1/S2: .json seed lists (reference utils.py:84-94 file_to_dict_list
    accepts JSON) — array-of-objects form, structure column sniffed."""
    from mine_database_spark.sources.readers import read_compound_list

    f = tmp_path / "seeds.json"
    f.write_text(
        '[{"id": "j1", "structure": "abcd", "name": "x"},'
        ' {"id": "j2", "structure": "efgh", "name": "y"}]'
    )
    seeds = read_compound_list(spark, str(f))
    rows = {r["id"]: r["structure"] for r in seeds.collect()}
    assert rows == {"j1": "abcd", "j2": "efgh"}


def test_compound_list_jsonl_multi_row(spark, tmp_path):
    """S1/S2 regression: JSON-LINES seed files must yield every row.
    A multiLine read of a JSONL file parses only the first object (with no
    _corrupt_record to signal it), so the reader sniffs the form first."""
    from mine_database_spark.sources.readers import read_compound_list

    f = tmp_path / "seeds_lines.json"
    f.write_text(
        '{"id": "l1", "structure": "abcd"}\n'
        '{"id": "l2", "structure": "efgh"}\n'
        '{"id": "l3", "structure": "ijkl"}\n'
    )
    seeds = read_compound_list(spark, str(f))
    rows = {r["id"]: r["structure"] for r in seeds.collect()}
    assert rows == {"l1": "abcd", "l2": "efgh", "l3": "ijkl"}


def test_compound_list_json_array_pretty(spark, tmp_path):
    """Array form spread over multiple lines still parses via multiLine."""
    from mine_database_spark.sources.readers import read_compound_list

    f = tmp_path / "seeds_pretty.json"
    f.write_text(
        '[\n  {"id": "p1", "structure": "abcd"},\n'
        '  {"id": "p2", "structure": "efgh"}\n]\n'
    )
    seeds = read_compound_list(spark, str(f))
    rows = {r["id"]: r["structure"] for r in seeds.collect()}
    assert rows == {"p1": "abcd", "p2": "efgh"}


def test_rules_select_generalized(spark):
    """S6 full selection semantics (reference rules.py:28-211): feature
    include/exclude rlike vocabulary, anaerobic O2 cut, coverage CDF cut,
    and the reference's composed rule-name strings."""
    from mine_database_spark.sources.readers import rules_select_generalized

    rows = [
        # name, reactants, smarts, counts
        ("r_arom", "Any", "[#6:1]:[#6:2]>>[#6:1]", 50),
        ("r_halo", "Any", "[#17:1][#6:2]>>[#6:2]", 30),
        ("r_oxy", "O2;Any", "[#8:1]=[#6:2]>>[#6:2]", 15),
        ("r_plain", "Any", "[#6:1][#6:2]>>[#6:1]", 5),
    ]
    df = spark.createDataFrame(rows, "name string, reactants string, smarts string, counts int")

    inc, name = rules_select_generalized(df, include_containing=["aromatic", "halogen"])
    assert {r["name"] for r in inc.collect()} == {"r_arom", "r_halo"}
    assert name == "Metacyc_generalized_with_inclusion"

    exc, name = rules_select_generalized(
        df, fraction_coverage=0.9, exclude_containing=["aromatic", "halogen"]
    )
    # survivors: r_oxy(15) + r_plain(5); CDF cut at 0.9 keeps both
    assert {r["name"] for r in exc.collect()} == {"r_oxy", "r_plain"}
    assert name == "Metacyc_generalized_0,9_fraction_coverage_with_exclusion"

    ana, name = rules_select_generalized(df, n_rules=2, anaerobic=True)
    assert {r["name"] for r in ana.collect()} == {"r_arom", "r_halo"}
    assert name == "Metacyc_generalized_2_rules_anaerobic"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown rule features"):
        rules_select_generalized(df, include_containing=["plutonium"])


def test_bnice_static_paths(spark, tmp_path, monkeypatch):
    """S8: bnice_paths resolves the original-rules TSV pair against a
    configured data dir (arg or $MINE_RULES_DIR) and the rules path feeds
    read_rules_tsv; unconfigured/missing dirs raise clearly."""
    import pytest as _pytest

    from mine_database_spark.sources.readers import bnice_paths, read_rules_tsv

    d = tmp_path / "ruleset" / "original_rules"
    d.mkdir(parents=True)
    (d / "EnzymaticReactionRules.tsv").write_text(
        "Name\tReactants\tSMARTS\tProducts\n1.1.1_01\tAny\tab>>cd\tAny\n"
    )
    (d / "EnzymaticCoreactants.tsv").write_text("ATP\tatp\tatp\n")

    rules_p, co_p, name = bnice_paths(str(tmp_path / "ruleset"))
    assert name == "BNICE"
    df, rules = read_rules_tsv(spark, rules_p)
    assert len(rules) == 1 and rules[0].name == "1.1.1_01"

    monkeypatch.setenv("MINE_RULES_DIR", str(tmp_path / "ruleset"))
    assert bnice_paths()[0] == rules_p

    monkeypatch.delenv("MINE_RULES_DIR")
    with _pytest.raises(FileNotFoundError, match="not configured"):
        bnice_paths()
    with _pytest.raises(FileNotFoundError, match="missing"):
        bnice_paths(str(tmp_path))


def test_peak_file_readers(spark, tmp_path):
    from mine_database_spark.sources.readers import read_adducts, read_mgf, read_msp

    mgf = tmp_path / "t.mgf"
    mgf.write_text(
        "BEGIN IONS\nTITLE=peak1\nPEPMASS=427.0294\nRTINSECONDS=300\n"
        "100.0 1.0\n200.0 0.5\nEND IONS\n"
    )
    p = read_mgf(spark, str(mgf))
    row = p.collect()[0]
    assert row["name"] == "peak1" and row["mz"] == 427.0294 and len(row["ms2"]) == 2

    msp = tmp_path / "t.msp"
    msp.write_text(
        "Name: peakA\nPrecursorMZ: 300.5\nNum Peaks: 2\n100.0 1.0\n150.0 2.0\n\n"
        "Name: peakB\nPrecursorMZ: 400.5\nNum Peaks: 1\n120.0 1.0\n"
    )
    p2 = read_msp(spark, str(msp))
    rows = {r["name"]: r for r in p2.collect()}
    assert set(rows) == {"peakA", "peakB"}
    assert len(rows["peakA"]["ms2"]) == 2

    ad = tmp_path / "adducts.txt"
    ad.write_text(
        "# name mult mass\n[M+H]+\t1.0\t1.007276\n[M+Na]+ 1.0 22.989218\n"
        "short_line\n[M+bad]+ x y\n"
        # tab-INDENTED data and comment lines: line.strip() semantics — a
        # space-only trim would split a leading '' field and silently drop
        "\t[M+K]+\t1.0\t38.963158\n\t# indented comment\n"
    )
    a = read_adducts(spark, str(ad))
    rows = {r["adduct_name"]: r for r in a.collect()}
    assert set(rows) == {"[M+H]+", "[M+Na]+", "[M+K]+"}  # comment/short/unparseable dropped
    assert rows["[M+K]+"]["ion_mass"] == 38.963158
    assert rows["[M+H]+"]["mass_mult"] == 1.0 and rows["[M+H]+"]["ion_mass"] == 1.007276
    assert rows["[M+Na]+"]["charge"] == "+"
    # distributed: a text FileScan, not a driver-collected local relation
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Scan text" in plan and "ExistingRDD" not in plan


def test_warehouse_roundtrip(spark, tmp_path):
    from mine_database_spark.chem import get_backend
    from mine_database_spark.operators.expansion import (
        NetworkExpansion,
        Rule,
        compound_id,
    )
    from mine_database_spark.sources.writers import (
        load_warehouse,
        save_warehouse,
        write_compounds_tsv,
        write_reactions_tsv,
    )

    backend = get_backend()
    co = {"ATP": ("atp", compound_id(backend.inchi_key("atp"), "Coreactant")),
          "ADP": ("adp", compound_id(backend.inchi_key("adp"), "Coreactant"))}
    eng = NetworkExpansion(spark, [Rule("r1", ["ATP", "Any"], ["Any", "ADP"], "ab>>cd")], co, frontier_partitions=2)
    cpds, rxns = eng.transform_all(eng.starting_compounds([("s", "abab")]), generations=1)

    wh = str(tmp_path / "wh")
    save_warehouse(cpds, rxns, wh)
    c2, r2, e2 = load_warehouse(spark, wh)
    assert c2.count() == cpds.count()
    assert r2.count() == rxns.count()
    assert e2.count() == 8

    write_compounds_tsv(cpds, str(tmp_path / "cpds_tsv"))
    write_reactions_tsv(rxns, str(tmp_path / "rxns_tsv"))
    out = spark.read.option("sep", "\t").option("header", True).csv(str(tmp_path / "cpds_tsv"))
    assert out.count() == cpds.count()


def test_core_compound_merge(spark):
    from mine_database_spark.sources.writers import merge_core_compounds

    existing = spark.createDataFrame(
        [("Caaa", "m1", "IK1", 10.0, 0, "C", 0.1, [1], ["run1"])], CORE_COMPOUND_SCHEMA
    )
    new = spark.createDataFrame(
        [("Caaa", "m1", "IK1", 10.0, 0, "C", 0.1, [1]), ("Cbbb", "m2", "IK2", 20.0, 1, "CC", 0.2, [2])],
        "`_id` string, smiles string, inchi_key string, mass double, charge int, formula string, logp double, rdkit_fp array<int>",
    )
    merged = merge_core_compounds(existing, new, "run2")
    rows = {r["_id"]: r["mines"] for r in merged.collect()}
    assert rows["Caaa"] == ["run1", "run2"]
    assert rows["Cbbb"] == ["run2"]


def test_mzxml_reader(spark, tmp_path):
    """S21 mzXML: msLevel=2 scans yield peaks with precursor mz, PT…S
    retention time, and per-scan polarity (reference metabolomics.py:827-857)."""
    from mine_database_spark.sources.readers import read_mzxml

    xml = """<?xml version="1.0"?>
<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2">
 <msRun>
  <scan num="1" msLevel="1" retentionTime="PT10.0S" polarity="+"></scan>
  <scan num="2" msLevel="2" retentionTime="PT12.5S" polarity="+">
   <precursorMz>427.0294</precursorMz>
  </scan>
  <scan num="3" msLevel="2" retentionTime="PT99.0S" polarity="-">
   <precursorMz>301.1</precursorMz>
  </scan>
 </msRun>
</mzXML>
"""
    f = tmp_path / "t.mzxml"
    f.write_text(xml)
    rows = {r["name"]: r for r in read_mzxml(spark, str(f)).collect()}
    assert set(rows) == {"427.0294 @ 12.5", "301.1 @ 99.0"}
    r = rows["427.0294 @ 12.5"]
    assert r["mz"] == 427.0294 and r["r_time"] == 12.5 and r["charge"] == "+"
    assert rows["301.1 @ 99.0"]["charge"] == "-"


def test_peak_readers_are_distributed(spark, tmp_path):
    """The peak parsers must not collect record bodies to the driver: the
    plan reads wholetext files and parses in mapInPandas (executor-side).
    Multiple files parallelize into multiple partitions."""
    d = tmp_path / "mgfs"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.mgf").write_text(
            f"BEGIN IONS\nTITLE=p{i}\nPEPMASS={100 + i}.5\nRTINSECONDS=1\n10.0 1.0\nEND IONS\n"
        )
    from mine_database_spark.sources.readers import read_mgf

    df = read_mgf(spark, str(d))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert {r["name"] for r in df.collect()} == {"p0", "p1", "p2"}
    assert df.rdd.getNumPartitions() >= 3  # one per file — records never funnel through the driver


def test_compound_list_reader_is_distributed(spark, tmp_path):
    """S2/S3: the seed-list path must never collect structures to the
    driver — read_compound_list returns a DataFrame and
    starting_compounds_df sanitizes in mapInPandas (executor-side), with
    file-order first-wins dedup and seed-over-coreactant id priority."""
    from mine_database_spark.operators.expansion import NetworkExpansion
    from mine_database_spark.sources.readers import read_compound_list

    f = tmp_path / "seeds.csv"
    f.write_text(
        "id,smiles\nseed1,abcd\nseed2,efgh\nseed_dup,abcd\nbad,\n"
    )
    seeds = read_compound_list(spark, str(f))
    assert seeds.columns == ["id", "structure", "__pos"]
    assert seeds.count() == 3  # empty structure dropped, nothing collected

    engine = NetworkExpansion(spark, rules=[], coreactants={})
    cpds = engine.starting_compounds_df(seeds)
    plan = cpds._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # sanitize runs executor-side
    rows = {r["id"]: r for r in cpds.collect()}
    # duplicate structure deduped, first file occurrence (seed1) wins
    assert set(rows) == {"seed1", "seed2"}
    assert all(r["type"] == "Starting Compound" and r["generation"] == 0 for r in rows.values())
    assert all(r["expand"] for r in rows.values())

    # list-based wrapper gives the same compounds
    via_list = {r["id"] for r in engine.starting_compounds(
        [("seed1", "abcd"), ("seed2", "efgh"), ("seed_dup", "abcd")]).collect()}
    assert via_list == {"seed1", "seed2"}


def test_metabolomics_rt_filter(spark, adducts):
    """F6 RT half (reference filters/metabolomics.py:300-381): a mass hit
    survives only when |expt_rt − predicted_rt| ≤ threshold; the prediction
    lands on the compound as predicted_rt."""
    from mine_database_spark.chem import get_backend
    from mine_database_spark.operators.filters import (
        DeterministicRTPredictor,
        MetabolomicsFilter,
    )
    from mine_database_spark.schemas import COMPOUND_SCHEMA, PEAK_SCHEMA, REACTION_SCHEMA

    b = get_backend()
    pred = DeterministicRTPredictor()

    def cpd(cid, smi):
        return (cid, cid, smi, b.inchi_key(smi), "Predicted", 1, b.formula(smi),
                b.atom_count(smi), True, None)

    compounds = spark.createDataFrame(
        [cpd("Crt1", "aa"), cpd("Crt2", "bb"),
         ("Xs", "Xs", "s", b.inchi_key("s"), "Coreactant", 0, b.formula("s"),
          b.atom_count("s"), False, None)],
        COMPOUND_SCHEMA,
    )
    # each candidate needs a producing reaction or orphan GC removes it
    reactions = spark.createDataFrame(
        [
            ("R1", [{"stoich": 1, "c_id": "Xs"}], [{"stoich": 1, "c_id": "Crt1"}], ["op"], "s => aa"),
            ("R2", [{"stoich": 1, "c_id": "Xs"}], [{"stoich": 1, "c_id": "Crt2"}], ["op"], "s => bb"),
        ],
        REACTION_SCHEMA,
    )
    peaks = spark.createDataFrame(
        [
            # peak RT agrees with the fake model for 'aa' → match survives
            ("pk_a", pred("aa") + 1.0, b.exact_mol_wt("aa") + 1.007276, "+", None, []),
            # mass window hits 'bb' but RT is 100s off → match vetoed
            ("pk_b", pred("bb") + 100.0, b.exact_mol_wt("bb") + 1.007276, "+", None, []),
        ],
        PEAK_SCHEMA,
    )
    filt = MetabolomicsFilter(peaks, adducts, tolerance=0.001,
                              rt_predictor=pred, rt_threshold=4.5)
    c2, r2 = filt.apply(compounds, reactions, generation=1)
    rows = {r["_id"]: r for r in c2.collect()}
    assert {k for k in rows if k.startswith("C")} == {"Crt1"}
    assert abs(rows["Crt1"]["predicted_rt"] - pred("aa")) < 1e-9
    # the reference grafts Matched_Peak_IDs / Matched_Adducts onto kept
    # compounds (filters/metabolomics.py:198-259); they ride the __ann_
    # upsert and survive the cascade
    assert rows["Crt1"]["matched_peak_ids"] == ["pk_a"]
    assert rows["Crt1"]["matched_adducts"] == ["[M+H]+"]
    # ...and a warehouse round-trip persists them (reference databases.py:344-358)
    import tempfile

    from mine_database_spark.sources.writers import load_warehouse, save_warehouse

    with tempfile.TemporaryDirectory() as d:
        save_warehouse(c2, r2, d)
        cpds2, _, _ = load_warehouse(spark, d)
        back = {r["_id"]: r for r in cpds2.collect()}
        assert back["Crt1"]["matched_peak_ids"] == ["pk_a"]
        assert back["Crt1"]["matched_adducts"] == ["[M+H]+"]

    # without an RT model the same peaks keep both compounds (mass-only path)
    c3, _ = MetabolomicsFilter(peaks, adducts, tolerance=0.001).apply(
        compounds, reactions, generation=1
    )
    rows3 = {r["_id"]: r for r in c3.collect() if r["_id"].startswith("C")}
    assert set(rows3) == {"Crt1", "Crt2"}
    assert rows3["Crt2"]["matched_peak_ids"] == ["pk_b"]


def test_spectra_storage_contract(spark, peaks, adducts, core, tmp_path):
    """Stored CFM spectra: attach_spectra builds the nested
    {mode: {energy: peaks}} map, score_stored_spectra scores MS2 queries
    against it (missing spectra -> 0, Spectral_score = round(score*1000)),
    the map survives merge_core_compounds, and the MSP library export
    renders one block per (compound, mode, energy)."""
    from mine_database_spark.operators.metabolomics import (
        attach_spectra,
        find_db_hits,
        score_stored_spectra,
    )
    from mine_database_spark.sources.compound_io import export_spectral_library
    from mine_database_spark.sources.writers import merge_core_compounds

    flat = spark.createDataFrame(
        [
            ("Caaa", "Positive", "20V", [(100.0, 1.0), (200.0, 0.5)]),
            ("Caaa", "Positive", "40V", [(50.0, 1.0)]),
            ("Caaa", "Negative", "20V", [(99.0, 1.0)]),
        ],
        "`_id` string, ion_mode string, energy string, peaks array<struct<mz:double,intensity:double>>",
    )
    with_spec = attach_spectra(core, flat)
    row = {r["_id"]: r["spectra"] for r in with_spec.collect()}
    assert set(row["Caaa"].keys()) == {"Positive", "Negative"}
    assert [p["mz"] for p in row["Caaa"]["Positive"]["20V"]] == [100.0, 200.0]
    assert row["Cbbb"] is None  # no spectra -> NULL (reference: empty dict)

    # p1's mass window hits Caaa and Cbbb; only Caaa has a stored Positive/20V
    hits = find_db_hits(peaks, adducts, with_spec.drop("mines"), tolerance=0.01)
    isomers = hits.join(with_spec.select("_id", "spectra"), "_id", "left")
    scored = score_stored_spectra(isomers, [(100.0, 1.0), (200.0, 0.5)], charge="+", energy_level=20)
    got = {r["_id"]: (r["spectral_score"], r["rank"]) for r in scored.where(F.col("peak_id") == "p1").collect()}
    assert got["Caaa"] == (1000, 1)  # exact spectrum match
    assert got["Cbbb"] == (0, 2)     # no stored spectrum -> 0

    merged = merge_core_compounds(with_spec, with_spec.limit(0), "run2")
    mrow = {r["_id"]: r["spectra"] for r in merged.collect()}
    assert [p["mz"] for p in mrow["Caaa"]["Positive"]["40V"]] == [50.0]

    out = str(tmp_path / "speclib")
    export_spectral_library(with_spec, out)
    text = spark.read.text(out).agg(F.concat_ws("\n", F.collect_list("value"))).first()[0]
    assert text.count("Name: MINE Compound Caaa") == 3  # 3 (mode, energy) blocks
    assert "Num Peaks: 2" in text and "Instrument: CFM-ID 4.0" in text
    assert "Ionization: Negative" in text and "Energy: 40V" in text
