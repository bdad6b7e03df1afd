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
    """F2 (filters/property.py:102-189): keep iff every configured element
    count falls in its range; missing elements count as 0."""
    from mine_database_spark.operators.filters import AtomicCompositionFilter

    cands = spark.createDataFrame(
        [
            _cpd("C1aa", "cc", {"C": 2, "O": 1}),
            _cpd("C2aa", "ccc", {"C": 9}),          # C out of range
            _cpd("C3aa", "c", {"C": 1}),            # O missing -> 0, in [0,2]
            _cpd("C4aa", "co3", {"C": 1, "O": 3}),  # O out of range
        ],
        COMPOUND_SCHEMA,
    )
    f = AtomicCompositionFilter({"C": (1, 5), "O": (0, 2)})
    got = {r["_id"]: r["keep"] for r in f.choose(cands, generation=1).collect()}
    assert got == {"C1aa": True, "C2aa": False, "C3aa": True, "C4aa": False}


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
