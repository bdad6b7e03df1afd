"""Explicit StructTypes for every engine table (SURVEY §1, FIXTURES.md).

The reference's schema regime is implicit (Python dicts / schemaless Mongo);
the Spark build fixes explicit columnar schemas. Adjacency lists
(Reactant_in / Product_of, pickaxe.py:546-547) are NOT materialized on the
compound rows — they become the exploded `edges` table, which scales (no
16MB-document workarounds like databases.py:290-473) and gives Catalyst an
honest join key.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# compounds (reference dict shape pickaxe.py:538-551)
COMPOUND_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),          # 'C'|'X'|'T' + sha1(inchikey block)
        StructField("id", StringType(), True),            # user name or assigned pkc%07d
        StructField("smiles", StringType(), True),
        StructField("inchi_key", StringType(), True),
        StructField("type", StringType(), True),          # Coreactant|Starting Compound|Predicted|Target Compound
        StructField("generation", IntegerType(), True),
        StructField("formula", StringType(), True),
        StructField("atom_count", MapType(StringType(), IntegerType()), True),
        StructField("expand", BooleanType(), True),
        StructField("last_similarity", DoubleType(), True),
    ]
)

STOICH_SCHEMA = StructType(
    [StructField("stoich", IntegerType(), False), StructField("c_id", StringType(), False)]
)

# reactions (reference reactions.py:206-213)
REACTION_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),          # 'R' + sha256(canonical equation)
        StructField("reactants", ArrayType(STOICH_SCHEMA), False),
        StructField("products", ArrayType(STOICH_SCHEMA), False),
        StructField("operators", ArrayType(StringType()), False),
        StructField("smiles_rxn", StringType(), True),
    ]
)

# exploded bipartite graph (replaces reactant_in/product_of adjacency lists)
EDGE_SCHEMA = StructType(
    [
        StructField("c_id", StringType(), False),
        StructField("rxn_id", StringType(), False),
        StructField("role", StringType(), False),         # 'reactant' | 'product'
        StructField("stoich", IntegerType(), False),
    ]
)

# reaction rules TSV (pickaxe.py:396-439; FIXTURES.md §3)
RULE_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("reactants", StringType(), False),    # ';'-joined roles, 'Any' = wildcard
        StructField("smarts", StringType(), False),
        StructField("products", StringType(), False),
        StructField("comments", StringType(), True),
        StructField("counts", IntegerType(), True),
    ]
)

# coreactants TSV (pickaxe.py:338-377)
COREACTANT_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("abbreviation", StringType(), True),
        StructField("smiles", StringType(), False),
    ]
)

# metabolomics peaks (metabolomics.py:548-570)
MS2_PEAK = StructType([StructField("mz", DoubleType(), False), StructField("intensity", DoubleType(), False)])
PEAK_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("r_time", DoubleType(), True),
        StructField("mz", DoubleType(), False),
        StructField("charge", StringType(), False),       # '+' | '-'
        StructField("inchi_key", StringType(), True),
        StructField("ms2", ArrayType(MS2_PEAK), True),
    ]
)

# stored CFM spectra on core compounds (databases.py:548-566 'Spectra'):
# {ion_mode ('Positive'|'Negative') -> {energy ('20V' ...) -> peak list}}
SPECTRA_TYPE = MapType(StringType(), MapType(StringType(), ArrayType(MS2_PEAK)))

# adduct dimension (metabolomics.py:118-142)
ADDUCT_SCHEMA = StructType(
    [
        StructField("adduct_name", StringType(), False),
        StructField("mass_mult", DoubleType(), False),
        StructField("ion_mass", DoubleType(), False),
        StructField("charge", StringType(), False),
    ]
)

# core compounds cross-run dimension (databases.py:536-572)
CORE_COMPOUND_SCHEMA = StructType(
    [
        StructField("_id", StringType(), False),
        StructField("smiles", StringType(), True),
        StructField("inchi_key", StringType(), True),
        StructField("mass", DoubleType(), True),
        StructField("charge", IntegerType(), True),
        StructField("formula", StringType(), True),
        StructField("logp", DoubleType(), True),
        StructField("rdkit_fp", ArrayType(IntegerType()), True),
        StructField("mines", ArrayType(StringType()), True),
    ]
)
