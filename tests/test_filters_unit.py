"""Direct unit tests for filters previously covered only indirectly:
F2 AtomicCompositionFilter (per-element count ranges) and F11
TargetReactivityGuard (stop expanding target-matching compounds without
removing them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mine_database_spark.schemas import COMPOUND_SCHEMA


def _cpd(cid, smiles, atom_count, gen=1, ctype="Predicted", expand=True):
    return (cid, None, smiles, None, ctype, gen, None, atom_count, expand, None)


def test_atomic_composition_filter(spark):
    """F2 (filters/property.py:123-189), reference semantics: a constraint
    binds only elements PRESENT in the compound (missing element = that
    constraint passes), and falsy endpoints default to 0 / 10^5."""
    from mine_database_spark.operators.filters import AtomicCompositionFilter

    cands = spark.createDataFrame(
        [
            _cpd("C1aa", "cc", {"C": 2, "O": 1}),
            _cpd("C2aa", "ccc", {"C": 9}),          # C out of range
            _cpd("C3aa", "c", {"O": 1}),            # C missing -> C constraint passes
            _cpd("C4aa", "co3", {"C": 1, "O": 3}),  # O out of range
            _cpd("C5aa", "n", {"N": 4}),            # no constrained element present
        ],
        COMPOUND_SCHEMA,
    )
    f = AtomicCompositionFilter({"C": (1, 5), "O": (0, 2)})
    got = {r["_id"]: r["keep"] for r in f.choose(cands, generation=1).collect()}
    assert got == {"C1aa": True, "C2aa": False, "C3aa": True, "C4aa": False, "C5aa": True}

    # falsy endpoints: None lower -> 0, None/0 upper -> 10^5 (the
    # reference's `or` defaults, including 0-means-unbounded on the max)
    f2 = AtomicCompositionFilter({"C": (None, None), "O": (2, 0)})
    got2 = {r["_id"]: r["keep"] for r in f2.choose(cands, generation=1).collect()}
    assert got2["C1aa"] is False  # O=1 < min 2
    assert got2["C4aa"] is True   # O=3 <= 10^5 (0 upper treated as unset)


def test_target_reactivity_guard(spark):
    """F11 (similarity.py:179-191): compounds whose hash suffix matches a
    target get expand=False but are NOT removed; others untouched."""
    from mine_database_spark.operators.filters import TargetReactivityGuard
    from mine_database_spark.schemas import REACTION_SCHEMA

    compounds = spark.createDataFrame(
        [_cpd("Cabc1", "aa", None), _cpd("Cdef2", "bb", None)], COMPOUND_SCHEMA
    )
    reactions = spark.createDataFrame([], REACTION_SCHEMA)
    guard = TargetReactivityGuard(["Tabc1"])  # target shares the 'abc1' suffix
    cpds_out, rxns_out = guard.apply(compounds, reactions, generation=1)
    rows = {r["_id"]: r["expand"] for r in cpds_out.collect()}
    assert rows == {"Cabc1": False, "Cdef2": True}  # guarded, not removed
    assert rxns_out.count() == 0
