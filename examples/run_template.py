"""Template for a network-expansion run — the Spark-first equivalent of the
reference's pickaxe_run_template.py (studied at
/root/reference/minedatabase/pickaxe_run_template.py; same numbered skeleton,
DataFrame engine underneath):

   1. Build a SparkSession (replaces the MongoDB connection)
   2. Load reaction rules and cofactors
   3. Load starting compounds
   4. Load filtering options
   5. Transform compounds
   6. Write results

Run directly (`python examples/run_template.py`) for a toy end-to-end pass on
the deterministic fake chemistry backend, or import `run()` and point it at
real rules/coreactants/compound files (with RDKit installed, the same code
runs real chemistry — the backend is auto-detected).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(
    rules_path: str | None = None,
    coreactants_path: str | None = None,
    compounds_path: str | None = None,
    out_dir: str | None = None,
    generations: int = 2,
    app_name: str = "mine-database-spark-run",
) -> dict:
    """Execute the template pipeline; returns summary counts. Any path left
    None falls back to a self-contained toy fixture (fake-backend rules)."""
    ###########################################################################
    # 1. Spark session (replaces "Connect to mongoDB")
    from mine_database_spark.session import get_spark

    spark = get_spark(app_name)
    spark.sparkContext.setLogLevel("ERROR")
    start = time.time()
    tmp = tempfile.mkdtemp(prefix="mine_spark_run_")
    out_dir = out_dir or os.path.join(tmp, "out")

    ###########################################################################
    # 2. Load reaction rules and cofactors
    #    Real MetaCyc runs: rules_select_generalized(...) / bnice_paths(...)
    #    give the reference's rule subsets (top-N / coverage / feature
    #    include-exclude).
    from mine_database_spark.sources.readers import (
        read_coreactants_tsv,
        read_rules_tsv,
    )

    if rules_path is None:
        rules_path = os.path.join(tmp, "rules.tsv")
        with open(rules_path, "w") as f:
            f.write(
                "Name\tReactants\tSMARTS\tProducts\tComments\tCounts\n"
                "2.7.1.a\tATP;Any\tab>>cd\tAny;ADP\t\t10\n"
                "1.1.1.b\tAny\tcd>>ef\tAny\t\t5\n"
            )
    if coreactants_path is None:
        coreactants_path = os.path.join(tmp, "coreactants.tsv")
        with open(coreactants_path, "w") as f:
            f.write("ATP\tatp\tatp\nADP\tadp\tadp\n")

    rules_df, rules = read_rules_tsv(spark, rules_path)
    coreactants = read_coreactants_tsv(spark, coreactants_path)

    ###########################################################################
    # 3. Load starting compounds (a DataFrame — seed lists are data, never
    #    collected to the driver; sanitization runs executor-side)
    from mine_database_spark.operators.expansion import NetworkExpansion
    from mine_database_spark.sources.readers import read_compound_list

    if compounds_path is None:
        compounds_path = os.path.join(tmp, "seeds.csv")
        with open(compounds_path, "w") as f:
            f.write("id,smiles\nfadh,abab\nnadh,ababab\n")

    engine = NetworkExpansion(spark, rules, coreactants)
    seeds = read_compound_list(spark, compounds_path)
    compounds = engine.starting_compounds_df(seeds)

    ###########################################################################
    # 4. Filtering options — same cascade semantics as the reference; the
    #    dep-gated model slots take the shipped dependency-free scorers
    #    (swap in eQuilibrator/torch-backed callables where installed).
    from mine_database_spark.operators.filters import MWFilter
    from mine_database_spark.operators.heavy_filters import (
        GroupContributionDGScorer,
        ThermoFilter,
    )

    filters = [
        MWFilter(min_mw=0.0, max_mw=5000.0),
        ThermoFilter(dg_max=1e6, scorer=GroupContributionDGScorer()),
    ]

    ###########################################################################
    # 5. Transform compounds
    compounds, reactions = engine.transform_all(
        compounds, generations=generations, filters=filters
    )

    ###########################################################################
    # 6. Write results: TSV exports + the parquet warehouse (the reference's
    #    MINE database write); SBML/SDF/KBase sinks live in
    #    sources/compound_io.py.
    from mine_database_spark.sources.writers import (
        save_warehouse,
        write_compounds_tsv,
        write_reactions_tsv,
    )

    write_compounds_tsv(compounds, os.path.join(out_dir, "compounds.tsv"))
    write_reactions_tsv(reactions, os.path.join(out_dir, "reactions.tsv"))
    save_warehouse(compounds, reactions, os.path.join(out_dir, "warehouse"))

    n_cpds, n_rxns = compounds.count(), reactions.count()
    return {
        "n_compounds": n_cpds,
        "n_reactions": n_rxns,
        "out_dir": out_dir,
        "seconds": round(time.time() - start, 1),
    }


if __name__ == "__main__":
    print(run())
