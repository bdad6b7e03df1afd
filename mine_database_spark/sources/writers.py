"""Sinks (SURVEY §2.1 S9-S19): sorted TSV exports, parquet warehouse,
core-compound upsert merge.

The Mongo-era machinery (16MB-document sharding, 10k-chunk bulk writes,
databases.py:263-473) is obsolete on columnar storage: adjacency lives in
the exploded edge table and writes are partitioned parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mine_database_spark.operators.expansion import edge_table


def write_compounds_tsv(compounds: DataFrame, path: str) -> None:
    """S9 (pickaxe.py:1104-1133): deterministic sorted TSV export."""
    (
        compounds.orderBy("_id")
        .select(
            "id",
            "_id",
            "smiles",
            "inchi_key",
            "type",
            "generation",
            "formula",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def write_reactions_tsv(reactions: DataFrame, path: str) -> None:
    """S10 (pickaxe.py:1135-1163): sorted TSV with rendered stoich arrays."""
    def render(side):
        return F.concat_ws(
            " + ",
            F.transform(F.col(side), lambda x: F.concat_ws(" ", x["stoich"].cast("string"), x["c_id"])),
        )

    (
        reactions.orderBy("_id")
        .select(
            "_id",
            render("reactants").alias("reactants"),
            render("products").alias("products"),
            F.concat_ws(";", F.col("operators")).alias("operators"),
            "smiles_rxn",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def save_warehouse(compounds: DataFrame, reactions: DataFrame, path: str) -> None:
    """S11/S17: persist the network as partitioned parquet tables — the
    'MINE store'. Compounds partition by generation (generational queries
    prune partitions); edges are written for join-heavy consumers."""
    compounds.write.mode("overwrite").partitionBy("generation").parquet(os.path.join(path, "compounds"))
    reactions.write.mode("overwrite").parquet(os.path.join(path, "reactions"))
    edge_table(reactions).write.mode("overwrite").parquet(os.path.join(path, "edges"))


def load_warehouse(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(os.path.join(path, "compounds")),
        spark.read.parquet(os.path.join(path, "reactions")),
        spark.read.parquet(os.path.join(path, "edges")),
    )


def save_warehouse_bucketed(
    compounds: DataFrame,
    reactions: DataFrame,
    db_name: str,
    n_buckets: int = 32,
) -> None:
    """S11 at 100 TB: catalog tables bucketed on the join keys.

    The hot access path is compound⋈edge⋈reaction provenance traversal
    (SURVEY §2.5 J3); bucketing `compounds` and `edges` on the compound hash
    and `reactions`/`edges` on the reaction hash makes those joins
    co-located — zero shuffle at read time, verified by the plan test
    (no Exchange above the bucketed scans). Replaces the reference's Mongo
    secondary indexes (databases.py:245-258) with storage-level layout.
    """
    spark = compounds.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db_name}")
    (
        compounds.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "_id")
        .sortBy("_id")
        .saveAsTable(f"{db_name}.compounds")
    )
    (
        reactions.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "_id")
        .sortBy("_id")
        .saveAsTable(f"{db_name}.reactions")
    )
    (
        edge_table(reactions).write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "c_id")
        .sortBy("c_id")
        .saveAsTable(f"{db_name}.edges")
    )


def write_targets_to_mine(targets: DataFrame, path: str) -> None:
    """S15 (reference databases.py:576-602 write_targets_to_mine): the target
    collection sink — identity columns only (_id, ID, SMILES, InChI_key),
    mirroring the reference's output_keys. Chunked bulk_write is obsolete on
    parquet; one partitioned write replaces it."""
    (
        targets.select("_id", "id", "smiles", "inchi_key")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "target_compounds"))
    )


def write_mass_sorted(core_compounds: DataFrame, path: str, n_files: int = 8) -> None:
    """S14 layout for the mass-range access path (SURVEY §2.5 J2): core
    compounds range-partitioned AND sorted on `mass`.

    Every file then covers a disjoint mass interval, so parquet min/max
    statistics prune all but the files overlapping a query window — the
    storage-level replacement for Mongo's Mass index (databases.py:245-250).
    At 100 TB this is the difference between scanning the fleet and scanning
    a handful of files per adduct window.
    """
    (
        core_compounds.repartitionByRange(n_files, F.col("mass"))
        .sortWithinPartitions("mass")
        .write.mode("overwrite")
        .parquet(path)
    )


def merge_core_compounds(existing: DataFrame, new: DataFrame, mine_name: str) -> DataFrame:
    """S14 (databases.py:477-572): upsert + MINES array-union. Pure-DataFrame
    merge (Delta MERGE INTO where available — same logical plan). The stored
    CFM `spectra` map (databases.py:566; see operators.metabolomics.
    attach_spectra) rides through the upsert first-wins like the other
    setOnInsert fields."""
    new = new.withColumn("mines", F.array(F.lit(mine_name)))
    u = existing.unionByName(new, allowMissingColumns=True)
    aggs = [
        F.first("smiles", ignorenulls=True).alias("smiles"),
        F.first("inchi_key", ignorenulls=True).alias("inchi_key"),
        F.first("mass", ignorenulls=True).alias("mass"),
        F.first("charge", ignorenulls=True).alias("charge"),
        F.first("formula", ignorenulls=True).alias("formula"),
        F.first("logp", ignorenulls=True).alias("logp"),
        F.first("rdkit_fp", ignorenulls=True).alias("rdkit_fp"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("mines")))).alias("mines"),
    ]
    if "spectra" in u.columns:
        aggs.append(F.first("spectra", ignorenulls=True).alias("spectra"))
    return u.groupBy("_id").agg(*aggs)


def write_zorder(
    df,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
):
    """Z-order (Morton-interleaved) clustered parquet write: rows sort by
    the bit-interleaving of their columns' RANKS, so file-level min/max
    zone maps stay tight on EVERY participating column at once — a range
    predicate on any of them prunes whole files, where a plain sort only
    serves its leading column. The multi-dimensional analogue of the
    mass-sorted layout (write_core_compounds_mass_sorted); Delta/Iceberg
    expose the same technique as OPTIMIZE ZORDER BY.

    Each column is rank-normalized to `bits` bits via a percent_rank
    window (value distributions are arbitrary; raw values would interleave
    uselessly when ranges differ), then the z-value interleaves the bit
    planes. repartitionByRange on the z-value gives each output file a
    contiguous z-range.

    Scale: one window per column over its own single sort + the final
    range shuffle — O(cols) shuffles total, no collect; for production at
    100 TB replace percent_rank with precomputed quantile boundaries
    (one pass, broadcast) to drop the per-column windows.
    """
    from pyspark.sql import Window

    if not cols or len(cols) > 4:
        raise ValueError(f"cols must have 1-4 entries, got {cols}")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    # the top interleaved bit lands at position bits*n_cols - 1; position
    # 63 is the bigint SIGN bit, so e.g. 4 cols × default 16 bits would
    # flip z negative for half the rows and range-partition them FIRST —
    # a silent monotonicity break, not an overflow
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits * len(cols) must be <= 63 (bigint sign bit), got "
            f"{bits} * {len(cols)} = {bits * len(cols)}; lower bits "
            f"(e.g. bits={63 // len(cols)})"
        )
    out = df
    scale = (1 << bits) - 1
    for c in cols:
        w = Window.orderBy(F.col(c))
        out = out.withColumn(
            f"__r_{c}", F.round(F.percent_rank().over(w) * scale).cast("bigint")
        )
    # interleave bit planes: z = sum over bit b, col i of
    # bit(b of col_i) << (b*n_cols + i)
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__r_{c}"), b).bitwiseAND(F.lit(1))
            z = z + F.call_function(
                "shiftleft", bit.cast("bigint"), F.lit(b * n + i)
            )
    out = out.withColumn("__z", z)
    if n_files is not None:
        out = out.repartitionByRange(n_files, "__z")
    else:
        out = out.repartitionByRange("__z")
    (
        out.sortWithinPartitions("__z")
        .drop(*[f"__r_{c}" for c in cols], "__z")
        .write.mode("overwrite")
        .parquet(path)
    )
