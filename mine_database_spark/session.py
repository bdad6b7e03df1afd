"""SparkSession factory.

Local testing runs on local[N]; the configuration is chosen so the same code
path scales to a multi-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (all chemistry/text UDFs are
pandas UDFs), explicit shuffle-partition sizing.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make mine_database_spark importable inside Python workers.

    Pandas-UDF bodies import this package on the executor side; a driver
    running from outside the repo (or a real cluster) needs the package
    shipped via addPyFile — the standard py-files deployment path.
    """
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), "mine_database_spark_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _SHIPPED.add(app)


def get_spark(app_name: str = "mine_database_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS); Spark
        # has no nanos timestamp type — read as bigint nanoseconds instead
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver-generated parquet tables as a dict of DataFrames."""
    names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    try:
        # needed for events.ts (parquet TIMESTAMP(NANOS)); the driver's own
        # session may not have it set, and it is session-dynamic
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    ship_package(spark)
    return {n: _read_table(spark, sf_dir, n) for n in names}


# (session id, sf_dir, table) → DataFrame. spark.read.parquet runs a
# schema-inference job per call; memoizing makes repeated plan BUILDS
# zero-job (the driver's correctness gate builds every registry query in one
# process), and guarantees one file-listing per table per session at scale.
_TABLE_CACHE: dict[tuple[int, str, str], "DataFrame"] = {}


def _read_table(spark: SparkSession, sf_dir: str, name: str):
    key = (id(spark), sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = _TABLE_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return df
