"""PII scanner/redactor: crafted-string goldens + DuckDB regex cross-check.

The registry query (pii_scan) covers the oracle path on table data; these
tests pin behavior on realistic PII shapes the synthetic corpus lacks.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mine_database_spark.functions import pii

SAMPLES = [
    ("plain text with no pii at all", 0, 0, 0, 0),
    ("mail me at jane.doe+spam@example.co.uk thanks", 1, 0, 0, 0),
    # "020 7946 0958" has only three digit groups — deliberately NOT a match
    ("call +1-415-555-2671 or 020 7946 0958", 0, 1, 0, 0),
    ("call (415) 555-2671 after lunch", 0, 1, 0, 0),
    ("(415)555-2671 and (202) 555.0100 both ring", 0, 2, 0, 0),
    ("server at 192.168.0.1 and 10.0.0.255", 0, 0, 2, 0),
    ("ssn 078-05-1120 leaked", 0, 0, 0, 1),
    ("a@b.io b@c.io 1.2.3.4 078-05-1120 +1-202-555-0100", 2, 1, 1, 1),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, (s, *_) in enumerate(SAMPLES)], "i int, t string"
    )


def test_counts_on_crafted_strings(spark, pii_df):
    got = pii_df.select(
        "i",
        pii.email_count(F.col("t")).alias("e"),
        pii.phone_count(F.col("t")).alias("p"),
        pii.ipv4_count(F.col("t")).alias("ip"),
        pii.ssn_count(F.col("t")).alias("s"),
    ).collect()
    by_i = {r.i: (r.e, r.p, r.ip, r.s) for r in got}
    for i, (_, e, p, ip, s) in enumerate(SAMPLES):
        assert by_i[i] == (e, p, ip, s), f"sample {i}: {by_i[i]} != {(e, p, ip, s)}"


def test_redaction_removes_all_pii(spark, pii_df):
    red = pii_df.select("i", pii.redact_pii(F.col("t")).alias("r"))
    left = red.select("i", pii.pii_count(F.col("r")).alias("n")).collect()
    assert all(r.n == 0 for r in left), [(r.i, r.n) for r in left]
    texts = {r.i: r.r for r in red.collect()}
    assert "<EMAIL>" in texts[1] and "jane" not in texts[1]
    assert texts[3].count("<PHONE>") == 1 and "415" not in texts[3]
    assert texts[4].count("<PHONE>") == 2
    last = len(SAMPLES) - 1
    assert texts[last].count("<EMAIL>") == 2 and "<SSN>" in texts[last] and "<PHONE>" in texts[last]


def test_spark_matches_duckdb_regex_semantics(spark, pii_df):
    """Same counts and same redacted bytes under Java regex and RE2."""
    srows = pii_df.select(
        "i",
        pii.pii_count(F.col("t")).alias("n"),
        pii.redact_pii(F.col("t")).alias("r"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE s (i INT, t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", [(i, s) for i, (s, *_) in enumerate(SAMPLES)])
    n_sql = " + ".join(
        pii.duckdb_count_sql("t", p)
        for p in (pii.EMAIL_RE, pii.PHONE_RE, pii.IPV4_RE, pii.SSN_RE)
    )
    drows = con.execute(
        f"SELECT i, {n_sql} AS n, {pii.duckdb_redact_sql('t')} AS r FROM s ORDER BY i"
    ).fetchall()
    got = sorted((r.i, r.n, r.r) for r in srows)
    assert got == [tuple(r) for r in drows]
