"""Sources (SURVEY §2.1 S1-S8, S20-S22): rules / coreactants / compound
lists / adducts / mass-spec peak files.

Small dimension files (rules, coreactants, adducts) are parsed to driver
structures for broadcast — they are the reference's broadcast dimensions
too. Big inputs (compound lists, peak files) go through spark.read.
"""

from __future__ import annotations

import pandas as pd
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
        out[name] = (csmi, compound_id(backend.inchi_key(csmi), "Coreactant", smiles=csmi))
    return out


def read_compound_list(spark: SparkSession, path: str, id_field: str = "id") -> DataFrame:
    """S2/S3 (pickaxe.py:244-336): CSV/TSV with a sniffed structure column
    (smiles | inchi | structure).

    Returns a DataFrame (id, structure, __pos) — seed lists are user DATA
    (possibly millions of rows), never collected to the driver. Only the
    header is inspected driver-side to sniff the structure column. __pos is
    the file-order position so first-occurrence-wins dedup downstream
    matches the reference's sequential loop; sanitization happens
    executor-side in NetworkExpansion.starting_compounds_df.

    Formats as the reference (utils.py:84-94): .tsv/.txt → tab CSV,
    .json → a JSON array of objects (multiLine) or JSON-lines, else CSV."""
    if path.endswith(".json"):
        # Sniff the first non-blank line to dispatch array vs JSON-lines:
        # multiLine parses exactly ONE top-level value, so pointing it at a
        # JSON-lines file silently yields only the first object (no
        # _corrupt_record to fall back on) — the form must be decided
        # before choosing the reader.
        head = [r[0] for r in spark.read.text(path).where(F.trim("value") != "").head(1)]
        first = head[0].lstrip() if head else ""
        if first.startswith("["):
            df = spark.read.option("multiLine", True).json(path)
        else:
            df = spark.read.json(path)
            if not df.columns or df.columns == ["_corrupt_record"]:
                df = spark.read.option("multiLine", True).json(path)
    else:
        sep = "\t" if path.endswith((".tsv", ".txt")) else ","
        df = spark.read.option("sep", sep).option("header", True).csv(path)
    cols = {c.lower(): c for c in df.columns}
    struct_col = next((cols[c] for c in ("smiles", "structure", "inchi") if c in cols), None)
    if struct_col is None:
        raise ValueError(f"no structure column in {path}: {df.columns}")
    idc = cols.get(id_field.lower(), df.columns[0])
    return (
        df.select(F.col(idc).alias("id"), F.col(struct_col).alias("structure"))
        # scan-side: (partition << 33) + row-in-partition == file order
        .withColumn("__pos", F.monotonically_increasing_id())
        .where(F.col("structure").isNotNull())
    )


def read_adducts(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S22 (metabolomics.py:118-142): whitespace/tab file with '#' comments.

    Fully distributed: spark.read.text + a native regexp split — no driver
    collect. Unparseable numeric fields drop (cast → NULL → filtered), the
    reference's try/except ValueError semantics."""
    # NOT F.trim(): Spark trim strips spaces only, so a tab-indented data
    # line would split into a leading '' field and silently drop (the
    # reference's line.strip() removes tabs too)
    clean = F.regexp_replace("value", r"^[\t ]+|[\t ]+$", "")
    parts = F.split(clean, r"[\t ]+")
    df = (
        spark.read.text(path)
        .where((clean != "") & ~clean.startswith("#"))
        .select(
            F.element_at(parts, 1).alias("adduct_name"),
            F.element_at(parts, 2).try_cast("double").alias("mass_mult"),
            F.element_at(parts, 3).try_cast("double").alias("ion_mass"),
            F.lit(charge).alias("charge"),
            F.size(parts).alias("__n"),
        )
        .where((F.col("__n") >= 3) & F.col("mass_mult").isNotNull() & F.col("ion_mass").isNotNull())
        .drop("__n")
    )
    return df


def _record_table(spark: SparkSession, path: str, sep_regex: str) -> DataFrame:
    """Executor-side record splitting for text peak archives: whole files
    arrive via spark.read.text(wholetext=True) — one row per file, files
    parallelize — then records explode with a native split. Nothing is ever
    collected to the driver (the import_sdf pattern, compound_io.py:166)."""
    raw = spark.read.text(path, wholetext=True)
    return raw.select(F.explode(F.split(F.col("value"), sep_regex)).alias("rec")).where(
        F.trim(F.col("rec")) != ""
    )


def read_mgf(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S21 (metabolomics.py:738-782): MGF → peaks DF with ms2 arrays.

    Distributed: records split executor-side on END IONS; per-record field
    parsing runs as an Arrow-batched mapInPandas. Unnamed peaks get the
    deterministic '<mz> @ <rt>' fallback (partition-order-independent,
    unlike the reference's running index)."""
    recs = _record_table(spark, path, r"END IONS")

    def parse(batches):
        for pdf in batches:
            out = {k: [] for k in ("name", "r_time", "mz", "charge", "inchi_key", "ms2")}
            for rec in pdf["rec"]:
                ms2, name, mz, rt, seen_begin = [], None, None, None, False
                for line in rec.splitlines():
                    line = line.strip()
                    if line == "BEGIN IONS":
                        seen_begin = True
                    elif not seen_begin:
                        continue
                    elif line.startswith("TITLE="):
                        name = line.split("=", 1)[1]
                    elif line.startswith("PEPMASS="):
                        mz = float(line.split("=", 1)[1].split()[0])
                    elif line.startswith("RTINSECONDS="):
                        rt = float(line.split("=", 1)[1])
                    elif line and line[0].isdigit():
                        parts = line.split()
                        if len(parts) >= 2:
                            ms2.append({"mz": float(parts[0]), "intensity": float(parts[1])})
                if seen_begin and mz is not None:
                    out["name"].append(name or f"{mz} @ {rt}")
                    out["r_time"].append(rt)
                    out["mz"].append(mz)
                    out["charge"].append(charge)
                    out["inchi_key"].append(None)
                    out["ms2"].append(ms2)
            if out["name"]:
                yield pd.DataFrame(out)

    return recs.mapInPandas(parse, PEAK_SCHEMA)


def read_msp(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S21 (metabolomics.py:785-824): MSP text format → peaks DF.

    Distributed like read_mgf: records split executor-side at 'Name:'
    boundaries (case-insensitive lookahead), fields parse per record in
    mapInPandas."""
    recs = _record_table(spark, path, r"(?im)^(?=name:)")

    def parse(batches):
        for pdf in batches:
            out = {k: [] for k in ("name", "r_time", "mz", "charge", "inchi_key", "ms2")}
            for rec in pdf["rec"]:
                name, mz, rt, ikey = None, None, None, None
                ms2: list[dict] = []
                n_expected = 0
                for line in rec.splitlines():
                    line = line.strip()
                    low = line.lower()
                    if low.startswith("name:"):
                        name = line.split(":", 1)[1].strip()
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
                            ms2.append({"mz": float(parts[0]), "intensity": float(parts[1])})
                if mz is not None:
                    out["name"].append(name or f"{mz} @ {rt}")
                    out["r_time"].append(rt)
                    out["mz"].append(mz)
                    out["charge"].append(charge)
                    out["inchi_key"].append(ikey)
                    out["ms2"].append(ms2)
            if out["name"]:
                yield pd.DataFrame(out)

    return recs.mapInPandas(parse, PEAK_SCHEMA)


def read_mzxml(spark: SparkSession, path: str, charge: str = "+") -> DataFrame:
    """S21 (metabolomics.py:827-857): mzXML → peaks DF.

    Whole files parallelize across executors (wholetext read); each file
    parses with ElementTree inside mapInPandas — the reference's exact
    extraction (msLevel=2 scans, precursorMz, retentionTime 'PT…S' attr,
    per-scan polarity; name = '<mz> @ <rt>'), minus the driver-side string."""
    raw = spark.read.text(path, wholetext=True)

    def parse(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out = {k: [] for k in ("name", "r_time", "mz", "charge", "inchi_key", "ms2")}
            for text in pdf["value"]:
                root = ET.fromstring(text)
                prefix = root.tag.strip("mzXML")
                for scan in root.findall(f".//{prefix}scan"):
                    if scan.attrib.get("msLevel") != "2":
                        continue
                    precursor = scan.find(f"./{prefix}precursorMz")
                    if precursor is None or precursor.text is None:
                        continue
                    mz = float(precursor.text)
                    rt_attr = scan.attrib.get("retentionTime", "")
                    rt = float(rt_attr[2:-1]) if len(rt_attr) > 3 else None
                    out["name"].append(f"{precursor.text} @ {rt_attr[2:-1] if rt_attr else ''}")
                    out["r_time"].append(rt)
                    out["mz"].append(mz)
                    out["charge"].append(scan.attrib.get("polarity", charge))
                    out["inchi_key"].append(None)
                    out["ms2"].append([])
            if out["name"]:
                yield pd.DataFrame(out)

    return raw.mapInPandas(parse, PEAK_SCHEMA)


# SMARTS feature vocabulary for rule inclusion/exclusion (reference
# rules.py:12-25 pattern_dictionary — public regex vocabulary over atomic
# numbers in mapped SMARTS)
RULE_FEATURE_PATTERNS = {
    "aromatic": r":\[|\]:",
    "aromatic_oxygen": r"^\[#6:\d+\]:|\[#6:\d+\]:|\[#6:\d+\]\d:|\[#6:\d+\]:\d",
    "carbonyl": r"=\[#8:\d\]|\[#8:\d\]=",
    "nitrogen": r"\[#7:\d+\]",
    "oxygen": r"\[#8:\d+\]",
    "fluorine": r"\[#9:\d+\]",
    "phosphorus": r"\[#15:\d+\]",
    "sulfur": r"\[#16:\d+\]",
    "chlorine": r"\[#17:\d+\]",
    "bromine": r"\[#35:\d+\]",
    "iodine": r"\[#53:\d+\]",
    "halogen": r"\[#(9|17|35|53):\d+\]",
}


def rules_select_generalized(
    rules_df: DataFrame,
    n_rules: int | None = None,
    fraction_coverage: float | None = None,
    anaerobic: bool = False,
    include_containing: list[str] | None = None,
    exclude_containing: list[str] | None = None,
    base_name: str = "Metacyc_generalized",
) -> tuple[DataFrame, str]:
    """S6 full selection semantics (reference rules.py:28-211
    metacyc_generalized): feature include/exclude over the SMARTS via the
    RULE_FEATURE_PATTERNS vocabulary, the anaerobic O2-reactant cut, then
    top-N or fraction-coverage CDF restriction over the survivors, and the
    reference's composed rule-name string. All filters are `rlike`
    predicates pushed onto the (tiny, broadcastable) rules dimension.

    Returns (selected rules DF, rule_name).
    """
    from pyspark.sql import Window

    df = rules_df
    name_append = ""
    if anaerobic:
        df = df.where(~F.col("reactants").rlike(r"^O2|;O2|O2;"))
        name_append += "_anaerobic"
    if include_containing:
        unknown = set(include_containing) - set(RULE_FEATURE_PATTERNS)
        if unknown:
            raise ValueError(f"unknown rule features: {sorted(unknown)}")
        pat = "|".join(RULE_FEATURE_PATTERNS[f] for f in include_containing)
        df = df.where(F.col("smarts").rlike(pat))
    if exclude_containing:
        unknown = set(exclude_containing) - set(RULE_FEATURE_PATTERNS)
        if unknown:
            raise ValueError(f"unknown rule features: {sorted(unknown)}")
        pat = "|".join(RULE_FEATURE_PATTERNS[f] for f in exclude_containing)
        df = df.where(~F.col("smarts").rlike(pat))

    if include_containing:
        name_append += "_with_inclusion"
    if exclude_containing:
        name_append += "_with_exclusion"

    if n_rules is not None:
        df = rules_top_n(df, n_rules)
        name = f"{base_name}_{n_rules}_rules"
    elif fraction_coverage is not None:
        order = [F.col("counts").desc_nulls_last(), F.col("name")]
        w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        tot = Window.partitionBy()
        df = (
            df.withColumn("__cum", F.sum("counts").over(w_cum))
            .withColumn("__total", F.sum("counts").over(tot))
            .where((F.col("__cum") - F.col("counts")) <= fraction_coverage * F.col("__total"))
            .drop("__cum", "__total")
        )
        name = f"{base_name}_{fraction_coverage}_fraction_coverage".replace(".", ",")
    else:
        name = base_name
    return df, name + name_append


def bnice_paths(data_dir: str | None = None) -> tuple[str, str, str]:
    """S8 (reference rules.py:442-457 BNICE): resolve the original BNICE
    ruleset — (rules_tsv_path, coreactants_tsv_path, 'BNICE') — the
    pre-MetaCyc enzymatic rules. The reference packages
    original_rules/EnzymaticReactionRules.tsv + EnzymaticCoreactants.tsv
    inside its wheel; this repo does not vendor that data, so the directory
    comes from `data_dir` or $MINE_RULES_DIR. The returned rules path feeds
    read_rules_tsv (same TSV dialect)."""
    import os

    root = data_dir or os.environ.get("MINE_RULES_DIR")
    if not root:
        raise FileNotFoundError(
            "BNICE ruleset directory not configured: pass data_dir= or set "
            "$MINE_RULES_DIR to a directory containing "
            "original_rules/EnzymaticReactionRules.tsv"
        )
    rules = os.path.join(root, "original_rules", "EnzymaticReactionRules.tsv")
    coreactants = os.path.join(root, "original_rules", "EnzymaticCoreactants.tsv")
    missing = [p for p in (rules, coreactants) if not os.path.isfile(p)]
    if missing:
        raise FileNotFoundError(f"BNICE ruleset files missing: {missing}")
    return rules, coreactants, "BNICE"


def rules_top_n(rules_df: DataFrame, n: int) -> DataFrame:
    """S6 analogue (rules.py:179-201): top-N rules by mapped count."""
    return rules_df.orderBy(F.col("counts").desc_nulls_last(), F.col("name")).limit(n)


def rules_intermediate_select(
    intermediate: DataFrame,
    generalized: DataFrame,
    n_rules: int | None = None,
    fraction_coverage: float | None = None,
) -> DataFrame:
    """S7 (rules.py:286-439 metacyc_intermediate): select intermediate rules
    through their generalized parents.

    The reference filters the intermediate rule table to names matching a
    regex alternation of the selected generalized names (:373-374) —
    intermediate names extend their parent ('rule0001_0023' ⊃ 'rule0001') —
    then ranks by mapped-reaction count with the CDF denominator being the
    TOTAL intermediate count computed BEFORE filtering (:352-355), and cuts
    at bisect_right(cdf, fraction)+1 (:414-416). Relationally the name match
    is an equi-join on the extracted base name, broadcast (rules are a
    dimension); bisect_right+1 on a monotone CDF is the predicate
    'preceding cumulative fraction <= target'.
    """
    from pyspark.sql import Window

    base = F.regexp_extract(F.col("name"), r"^([^_]+)", 1)
    total = intermediate.agg(F.sum("counts").alias("__total"))
    filt = (
        intermediate.withColumn("__base", base)
        .join(F.broadcast(generalized.select(F.col("name").alias("__base"))), "__base", "left_semi")
        .drop("__base")
    )
    order = [F.col("counts").desc_nulls_last(), F.col("name")]
    if n_rules is not None:
        w_rn = Window.orderBy(*order)
        return filt.withColumn("__rn", F.row_number().over(w_rn)).where(F.col("__rn") <= n_rules).drop("__rn")
    if fraction_coverage is not None:
        w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        return (
            filt.withColumn("__cum", F.sum("counts").over(w_cum))
            .crossJoin(F.broadcast(total))
            .where((F.col("__cum") - F.col("counts")) <= fraction_coverage * F.col("__total"))
            .drop("__cum", "__total")
        )
    return filt


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
