from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mine_database_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mine-database-spark-tests", shuffle_partitions=8)
    yield s


import os

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_t2():
    return SF_T2


@pytest.fixture(scope="session")
def network(spark):
    """Small expanded fake-chemistry network shared across test modules."""
    from mine_database_spark.chem import get_backend
    from mine_database_spark.operators.expansion import NetworkExpansion, Rule, compound_id

    backend = get_backend()
    co = {"ATP": ("atp", compound_id(backend.inchi_key("atp"), "Coreactant")),
          "ADP": ("adp", compound_id(backend.inchi_key("adp"), "Coreactant"))}
    eng = NetworkExpansion(spark, [Rule("r1", ["ATP", "Any"], ["Any", "ADP"], "ab>>cd")], co, frontier_partitions=2)
    cpds, rxns = eng.transform_all(eng.starting_compounds([("s", "abab")]), generations=1)
    return cpds, rxns
