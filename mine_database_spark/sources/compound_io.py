"""Cheminformatics-format exports/imports (SURVEY §2.1 S16, S18-S20).

Reference: compound_io.py (SDF/SMILES/mol sinks 16-150, ModelSEED TSV
153-240, InChI reactions 349-420) and save_to_SBML (pickaxe.py:1244-1476).

Spark shape: per-row rendering is native column expressions; the actual file
write is a partitioned text sink (foreachPartition semantics via write.text)
— no driver-side row loops. SDF/molfile blocks that need a real perception
library degrade to a minimal deterministic block under the fake backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_smiles(compounds: DataFrame, path: str) -> None:
    """S18: '<smiles>\t<id>' lines, sorted."""
    (
        compounds.orderBy("_id")
        .select(F.concat_ws("\t", F.col("smiles"), F.col("_id")).alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def export_sdf(compounds: DataFrame, path: str) -> None:
    """S18: minimal SDF-shaped blocks (full molblocks need RDKit; the record
    structure, properties and $$$$ separators are format-faithful)."""
    block = F.concat_ws(
        "\n",
        F.col("_id"),
        F.lit("  mine_database_spark"),
        F.lit(""),
        F.lit("  0  0  0  0  0  0  0  0  0  0999 V2000"),
        F.lit("M  END"),
        F.lit(">  <SMILES>"),
        F.col("smiles"),
        F.lit(">  <Generation>"),
        F.col("generation").cast("string"),
        F.lit("$$$$"),
    )
    compounds.orderBy("_id").select(block.alias("value")).coalesce(1).write.mode("overwrite").text(path)


def export_modelseed_tsv(compounds: DataFrame, path: str) -> None:
    """S19 (compound_io.py:153-240): ModelSEED-shaped TSV."""
    (
        compounds.orderBy("_id")
        .select(
            F.col("_id").alias("id"),
            F.col("id").alias("abbreviation"),
            F.col("id").alias("name"),
            F.col("formula"),
            F.col("smiles").alias("structure"),
            F.lit(0).alias("charge"),
            F.lit("false").alias("is_core"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def export_inchi_rxns(reactions: DataFrame, compounds: DataFrame, path: str) -> None:
    """S19 (compound_io.py:349-420): reaction equations rendered over a join
    to compound identity (InChI keys stand in for InChI under fake backend)."""
    from mine_database_spark.operators.expansion import edge_table

    keys = compounds.select(F.col("_id").alias("c_id"), F.col("inchi_key").alias("ik"))
    e = edge_table(reactions).join(keys, "c_id")
    rendered = (
        e.withColumn("term", F.concat_ws(" ", F.col("stoich").cast("string"), F.col("ik")))
        .groupBy("rxn_id", "role")
        .agg(F.concat_ws(" + ", F.array_sort(F.collect_list("term"))).alias("side"))
        .groupBy("rxn_id")
        .pivot("role", ["reactant", "product"])
        .agg(F.first("side"))
        .select(F.concat_ws(" => ", F.col("reactant"), F.col("product")).alias("value"), F.col("rxn_id"))
        .orderBy("rxn_id")
        .select("value")
    )
    rendered.coalesce(1).write.mode("overwrite").text(path)


def export_sbml(compounds: DataFrame, reactions: DataFrame, path: str, model_id: str = "mine") -> None:
    """S16 (pickaxe.py:1244-1476): SBML/XML export. Species and reactions
    render as columns; the XML envelope is assembled at write time.

    The result set is a pruned network (small by construction — the
    reference collects it too), so a single-partition text write is the
    honest plan; the rendering itself is distributed.
    """
    # union order is not write order — every section carries an explicit
    # (section, key) sort pair
    species = compounds.select(
        F.lit(1).alias("sec"),
        F.col("_id").alias("key"),
        F.format_string(
            '  <species id="%s" name="%s" compartment="c"/>',
            F.regexp_replace("_id", "[^A-Za-z0-9_]", "_"),
            F.coalesce("id", "_id"),
        ).alias("value"),
    )

    from mine_database_spark.operators.expansion import edge_table

    e = edge_table(reactions)
    refs = (
        e.withColumn(
            "ref",
            F.format_string(
                '      <speciesReference species="%s" stoichiometry="%d"/>',
                F.regexp_replace("c_id", "[^A-Za-z0-9_]", "_"),
                F.col("stoich"),
            ),
        )
        .groupBy("rxn_id", "role")
        .agg(F.concat_ws("\n", F.array_sort(F.collect_list("ref"))).alias("refs"))
        .groupBy("rxn_id")
        .pivot("role", ["reactant", "product"])
        .agg(F.first("refs"))
    )
    rxn_xml = refs.select(
        F.lit(3).alias("sec"),
        F.col("rxn_id").alias("key"),
        F.format_string(
            '  <reaction id="%s">\n    <listOfReactants>\n%s\n    </listOfReactants>\n'
            "    <listOfProducts>\n%s\n    </listOfProducts>\n  </reaction>",
            F.regexp_replace("rxn_id", "[^A-Za-z0-9_]", "_"),
            F.coalesce("reactant", F.lit("")),
            F.coalesce("product", F.lit("")),
        ).alias("value"),
    )

    spark = compounds.sparkSession
    markers = spark.createDataFrame(
        [
            (0, "0", '<?xml version="1.0" encoding="UTF-8"?>'),
            (0, "1", f'<sbml xmlns="http://www.sbml.org/sbml/level3" level="3" version="1"><model id="{model_id}">'),
            (0, "2", "<listOfSpecies>"),
            (2, "0", "</listOfSpecies>"),
            (2, "1", "<listOfReactions>"),
            (4, "0", "</listOfReactions>"),
            (4, "1", "</model></sbml>"),
        ],
        "sec int, key string, value string",
    )
    out = markers.unionByName(species).unionByName(rxn_xml).orderBy("sec", "key").select("value")
    out.coalesce(1).write.mode("overwrite").text(path)


def import_smiles_file(spark, path: str) -> DataFrame:
    """S20: '<smiles>[\t ]<name>' text file → (name, smiles) DataFrame."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), r"[\t ]+")
    return df.select(parts.getItem(1).alias("name"), parts.getItem(0).alias("smiles")).where(
        F.col("smiles").isNotNull() & (F.col("smiles") != "")
    )
