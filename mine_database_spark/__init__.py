"""mine_database_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tyo-nu/MINE-Database (reference studied at
/root/reference, see SURVEY.md), rebuilt Spark-first.

Layout:
  session     SparkSession factory tuned for large-scale batch analytics
  schemas     explicit StructTypes for every table (SURVEY §1)
  chem        pluggable chemistry backend (RDKit if present, deterministic fake otherwise)
  functions   expression library: hashing, descriptors, spectra, text, vectors
  sources     readers/writers (SURVEY §2.1 S1-S23)
  operators   expansion loop, filters, graph pruning, dedup, similarity,
              sessionization, metabolomics (SURVEY §2.2-§2.9)
  queries     the (queries, oracle_sql) registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
