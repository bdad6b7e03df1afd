"""Sources (SURVEY §2.1 S1-S8, S20-S22): rules / coreactants / compound
lists / adducts / mass-spec peak files.

Small dimension files (rules, coreactants, adducts) are parsed to driver
structures for broadcast — they are the reference's broadcast dimensions
too. Big inputs (compound lists, peak files) go through spark.read.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mine_database_spark.chem import get_backend
from mine_database_spark.operators.expansion import Rule, compound_id
from mine_database_spark.schemas import ADDUCT_SCHEMA, PEAK_SCHEMA, RULE_SCHEMA


def read_rules_tsv(spark: SparkSession, path: str) -> tuple[DataFrame, list[Rule]]:
    """S5 (pickaxe.py:379-443): TSV with '#' comments; reactant/product role
    lists are ';'-joined, 'Any' marks the wildcard substrate."""
    df = (
        spark.read.option("sep", "\t").option("header", True).option("comment", "#").csv(path)
    )
    cols = [c.lower() for c in df.columns]
    df = df.toDF(*cols)
    for needed in ("name", "reactants", "smarts", "products"):
        if needed not in cols:
            raise ValueError(f"rules file missing column {needed!r}")
    if "comments" not in cols:
        df = df.withColumn("comments", F.lit(None).cast("string"))
    if "counts" not in cols:
        df = df.withColumn("counts", F.lit(None).cast("int"))
    df = df.select("name", "reactants", "smarts", "products", "comments", F.col("counts").cast("int"))
    rules = [
        Rule(r["name"], r["reactants"].split(";"), r["products"].split(";"), r["smarts"])
        for r in df.collect()
    ]
    return spark.createDataFrame(df.collect(), RULE_SCHEMA), rules


def read_coreactants_tsv(spark: SparkSession, path: str) -> dict[str, tuple[str, str]]:
    """S4 (pickaxe.py:338-377): name -> (smiles, 'X'-prefixed hash id)."""
    backend = get_backend()
    out: dict[str, tuple[str, str]] = {}
    df = spark.read.option("sep", "\t").option("comment", "#").csv(path)
    for row in df.collect():
        vals = [v for v in row if v is not None]
        if len(vals) < 2:
            continue
        name, smiles = vals[0], vals[-1]
        csmi = backend.canonical_smiles(smiles)
        if not csmi:
            continue
        out[name] = (csmi, compound_id(backend.inchi_key(csmi), "Coreactant"))
    return out


def read_compound_list(spark: SparkSession, path: str, id_field: str = "id") -> list[tuple[str, str]]:
    """S2/S3 (pickaxe.py:244-336): CSV/TSV with a sniffed structure column
    (smiles | inchi | structure)."""
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    df = spark.read.option("sep", sep).option("header", True).csv(path)
    cols = {c.lower(): c for c in df.columns}
    struct_col = next((cols[c] for c in ("smiles", "structure", "inchi") if c in cols), None)
    if struct_col is None:
        raise ValueError(f"no structure column in {path}: {df.columns}")
    idc = cols.get(id_field.lower(), df.columns[0])
    return [(r[idc], r[struct_col]) for r in df.select(idc, struct_col).collect() if r[struct_col]]


def read_adducts(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S22 (metabolomics.py:118-142): whitespace/tab file with '#' comments."""
    rows = []
    raw = spark.sparkContext.textFile(path).collect()
    for line in raw:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = re.split(r"[\t ]+", line)
        if len(parts) < 3:
            continue
        try:
            rows.append((parts[0], float(parts[1]), float(parts[2]), charge))
        except ValueError:
            continue
    return spark.createDataFrame(rows, ADDUCT_SCHEMA)


def read_mgf(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S21 (metabolomics.py:738-782): MGF → peaks DF with ms2 arrays."""
    text = "\n".join(spark.sparkContext.textFile(path).collect())
    rows = []
    ms2: list[tuple[float, float]] = []
    name, mz, rt = None, None, None
    for line in text.splitlines():
        line = line.strip()
        if line == "BEGIN IONS":
            ms2, name, mz, rt = [], None, None, None
        elif line == "END IONS":
            if mz is not None:
                rows.append((name or f"peak_{len(rows)}", rt, mz, charge, None, ms2))
        elif line.startswith("TITLE="):
            name = line.split("=", 1)[1]
        elif line.startswith("PEPMASS="):
            mz = float(line.split("=", 1)[1].split()[0])
        elif line.startswith("RTINSECONDS="):
            rt = float(line.split("=", 1)[1])
        elif line and line[0].isdigit():
            parts = line.split()
            if len(parts) >= 2:
                ms2.append((float(parts[0]), float(parts[1])))
    return spark.createDataFrame(rows, PEAK_SCHEMA)


def read_msp(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S21 (metabolomics.py:785-824): MSP text format → peaks DF."""
    text = "\n".join(spark.sparkContext.textFile(path).collect())
    rows = []
    ms2: list[tuple[float, float]] = []
    name, mz, rt, ikey = None, None, None, None
    n_expected = 0
    for line in text.splitlines():
        line = line.strip()
        low = line.lower()
        if low.startswith("name:"):
            if mz is not None:
                rows.append((name or f"peak_{len(rows)}", rt, mz, charge, ikey, ms2))
            name, mz, rt, ikey, ms2, n_expected = line.split(":", 1)[1].strip(), None, None, None, [], 0
        elif low.startswith("precursormz:") or low.startswith("pepmass:"):
            mz = float(line.split(":", 1)[1].strip())
        elif low.startswith("retentiontime:"):
            rt = float(line.split(":", 1)[1].strip())
        elif low.startswith("inchikey:"):
            ikey = line.split(":", 1)[1].strip()
        elif low.startswith("num peaks:"):
            n_expected = int(line.split(":", 1)[1].strip())
        elif line and (line[0].isdigit() or line[0] == "-") and n_expected:
            parts = line.replace(";", " ").split()
            if len(parts) >= 2:
                ms2.append((float(parts[0]), float(parts[1])))
    if mz is not None:
        rows.append((name or f"peak_{len(rows)}", rt, mz, charge, ikey, ms2))
    return spark.createDataFrame(rows, PEAK_SCHEMA)


def rules_top_n(rules_df: DataFrame, n: int) -> DataFrame:
    """S6 analogue (rules.py:179-201): top-N rules by mapped count."""
    return rules_df.orderBy(F.col("counts").desc_nulls_last(), F.col("name")).limit(n)


def rules_fraction_coverage(rules_df: DataFrame, fraction: float) -> DataFrame:
    """S6 (rules.py:169, 386-387): smallest prefix of count-ordered rules
    reaching the coverage fraction — ordered cumulative-sum CDF (W2)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("counts").desc_nulls_last(), F.col("name")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    df = rules_df.withColumn("cum", F.sum("counts").over(w)).withColumn(
        "total", F.sum("counts").over(tot)
    )
    return df.where((F.col("cum") - F.col("counts")) < fraction * F.col("total")).drop("cum", "total")
