"""Cheminformatics-format exports/imports (SURVEY §2.1 S16, S18-S20).

Reference: compound_io.py (SDF/SMILES/mol sinks 16-150, ModelSEED TSV
153-240, InChI reactions 349-420) and save_to_SBML (pickaxe.py:1244-1476).

Spark shape: per-row rendering is native column expressions; the actual file
write is a partitioned text sink (foreachPartition semantics via write.text)
— no driver-side row loops. SDF/molfile blocks that need a real perception
library degrade to a minimal deterministic block under the fake backend.
"""

from __future__ import annotations

import os

import pandas as pd
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


def export_kbase(compounds: DataFrame, reactions: DataFrame, path: str, name: str = "mine") -> None:
    """S19 (reference compound_io.py:243-346 export_kbase): ModelSEED/KBase
    import TSV pair.

    `{name}_compounds.tsv`: id/name/formula/charge/aliases, cofactor ('X')
    compounds excluded (:292-293); charge computed by the chem backend (the
    reference reads the stored Charge field). `{name}_reactions.tsv`: fixed
    direction '>' / compartment 'c0' columns and the equation rendered as
    '(stoich) Cid + ... => ...' with X ids rewritten to C (:332-343) —
    KBase models reference the compound namespace, not cofactors.
    """
    @F.pandas_udf("int")
    def charge(smiles: pd.Series) -> pd.Series:
        from mine_database_spark.chem import get_backend

        b = get_backend()
        return smiles.map(b.formal_charge).astype("int32")

    (
        compounds.where(~F.col("_id").startswith("X"))
        .orderBy("_id")
        .select(
            F.col("_id").alias("id"),
            F.coalesce(F.col("id"), F.col("_id")).alias("name"),
            F.col("formula"),
            charge(F.col("smiles")).alias("charge"),
            F.coalesce(F.col("id"), F.col("_id")).alias("aliases"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(os.path.join(path, f"{name}_compounds.tsv"))
    )

    def render(side):
        return F.concat_ws(
            " + ",
            F.transform(
                F.col(side),
                lambda x: F.concat(
                    F.lit("("), x["stoich"].cast("string"), F.lit(") "),
                    # only the leading type prefix flips X->C; translate()
                    # would rewrite every 'X' anywhere in the id
                    F.regexp_replace(x["c_id"], r"^X", "C"),
                ),
            ),
        )

    (
        reactions.orderBy("_id")
        .select(
            F.col("_id").alias("id"),
            F.lit(">").alias("direction"),
            F.lit("c0").alias("compartment"),
            F.lit("").alias("gpr"),
            F.lit("").alias("name"),
            F.lit("").alias("enzyme"),
            F.lit("").alias("pathway"),
            F.lit("").alias("reference"),
            F.concat(render("reactants"), F.lit(" => "), render("products")).alias("equation"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(os.path.join(path, f"{name}_reactions.tsv"))
    )


def export_spectral_library(core_compounds: DataFrame, path: str) -> None:
    """MSP-style spectral-library export of stored CFM spectra (reference
    metabolomics.py:1138-1210 spectra_download): one block per
    (compound, ionization mode, energy) with 'Name: MINE Compound <id>'
    header, 'Instrument: CFM-ID 4.0', and a 'Num Peaks'-prefixed peak list.

    The nested spectra map explodes twice (mode, then energy); rendering is
    pure column expressions into a text sink — no driver loop.
    """
    m = core_compounds.where(F.col("spectra").isNotNull())
    per_mode = m.select("_id", "mass", "formula", F.explode("spectra").alias("ion_mode", "by_energy"))
    per_energy = per_mode.select(
        "_id", "mass", "formula", "ion_mode", F.explode("by_energy").alias("energy", "peaks")
    )
    peak_lines = F.transform(
        F.col("peaks"),
        lambda p: F.concat_ws(" ", p["mz"].cast("string"), p["intensity"].cast("string")),
    )
    block = F.concat_ws(
        "\n",
        F.concat(F.lit("Name: MINE Compound "), F.col("_id")),
        F.concat(F.lit("Mass: "), F.col("mass").cast("string")),
        F.concat(F.lit("Formula: "), F.coalesce(F.col("formula"), F.lit(""))),
        F.lit("Instrument: CFM-ID 4.0"),
        F.concat(F.lit("Ionization: "), F.col("ion_mode")),
        F.concat(F.lit("Energy: "), F.col("energy")),
        F.concat(F.lit("Num Peaks: "), F.size("peaks").cast("string")),
        F.concat_ws("\n", peak_lines),
        F.lit(""),
    )
    (
        per_energy.orderBy("_id", "ion_mode", "energy")
        .select(block.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
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


def import_sdf(spark, path: str) -> DataFrame:
    """S20 (reference compound_io.py:423-466 import_sdf): SDF file(s) →
    (name, smiles) DataFrame.

    Records split on the '$$$$' separator. Distributed shape: whole files
    arrive via spark.read.text(wholetext=True) — one row per file, Spark
    parallelizes across files — then records explode into rows; per-record
    parsing is a native split/filter, no Python loop on the driver.
    Structure perception from a real molblock needs RDKit; under the fake
    backend the SMILES is taken from the '> <SMILES>' property block that
    our own export_sdf writes (round-trip faithful).
    """
    raw = spark.read.text(path, wholetext=True)
    rec = raw.select(F.explode(F.split(F.col("value"), r"\$\$\$\$\s*")).alias("rec")).where(
        F.trim(F.col("rec")) != ""
    )
    lines = F.split(F.col("rec"), "\n")
    # SMILES = the line after the '>  <SMILES>' tag; name = first non-empty line
    return (
        rec.select(
            F.filter(lines, lambda x: F.trim(x) != "")[0].alias("name"),
            F.try_element_at(
                # nullif: a missing tag (array_position = 0) must yield NULL,
                # not element 1 (the record name posing as a SMILES)
                lines,
                F.nullif(
                    F.array_position(F.transform(lines, lambda x: F.trim(x)), ">  <SMILES>"), F.lit(0)
                ).cast("int")
                + 1,
            ).alias("smiles"),
        )
        .where(F.col("smiles").isNotNull() & (F.col("smiles") != ""))
        .select(F.trim(F.col("name")).alias("name"), F.trim(F.col("smiles")).alias("smiles"))
    )


def import_mol_dir(spark, dir_path: str) -> DataFrame:
    """S20 (reference compound_io.py:469-538 import_mol_dir): directory of
    .mol files → (name, smiles); name = file basename. Files parallelize via
    wholetext reads with input_file_name(); molblock perception degrades to
    the embedded SMILES property line under the fake backend.
    """
    raw = spark.read.text(dir_path + "/*.mol", wholetext=True).withColumn("file", F.input_file_name())
    lines = F.split(F.col("value"), "\n")
    return raw.select(
        F.regexp_extract(F.col("file"), r"([^/]+)\.mol$", 1).alias("name"),
        F.trim(
            F.try_element_at(
                # nullif: a missing tag (array_position = 0) must yield NULL,
                # not element 1 (the record name posing as a SMILES)
                lines,
                F.nullif(
                    F.array_position(F.transform(lines, lambda x: F.trim(x)), ">  <SMILES>"), F.lit(0)
                ).cast("int")
                + 1,
            )
        ).alias("smiles"),
    ).where(F.col("smiles").isNotNull() & (F.col("smiles") != ""))


def export_images(compounds: DataFrame, dir_path: str, fmt: str = "svg") -> int:
    """S23 (reference databases.py:175-243 generate_image_files): per-compound
    structure images as a foreachPartition side-effect sink.

    Real drawing needs RDKit/molconvert (not in this container) — the fake
    backend emits a deterministic SVG placeholder so the distributed sink
    plumbing (partition iteration, per-row file writes, executor-side import)
    is real and tested. Returns the number of images written.
    """
    import os

    os.makedirs(dir_path, exist_ok=True)

    def write_partition(rows) -> None:
        # executor-side: one file per compound, named by content hash id
        from mine_database_spark.chem import get_backend

        backend = get_backend()
        for row in rows:
            svg = (
                '<svg xmlns="http://www.w3.org/2000/svg"><text y="12">'
                f"{row['smiles']} [{backend.formula(row['smiles'])}]</text></svg>"
            )
            with open(os.path.join(dir_path, f"{row['_id']}.{fmt}"), "w") as fh:
                fh.write(svg)

    compounds.select("_id", "smiles").foreachPartition(write_partition)
    return len([f for f in os.listdir(dir_path) if f.endswith("." + fmt)])
