"""PII redaction: behaviour + Spark/DuckDB regex-dialect parity."""

from __future__ import annotations

import duckdb

from lexor_spark import textfns

CASES = [
    "mail me at bob.jones+x@sub.example.co.uk today",
    "call +1 (555) 010-7788 now",
    "host 192.168.1.77 and 10.0.0.1.",
    "no pii here at all",
    "mixed: a@b.io, 8.8.8.8, 555 123 4567!",
    "",
]


def test_redact_and_counts(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               ["i", "t"])
    rows = df.select(
        "i",
        textfns.redact_pii("t").alias("red"),
        textfns.pii_count("t", "email").alias("ne"),
        textfns.pii_count("t", "ipv4").alias("ni"),
        textfns.pii_count("t", "phone").alias("np"),
    ).orderBy("i").collect()

    assert rows[0].red == "mail me at <EMAIL> today" and rows[0].ne == 1
    assert rows[1].red == "call <PHONE> now" and rows[1].np == 1
    assert rows[2].red == "host <IP> and <IP>." and rows[2].ni == 2
    assert rows[3].red == CASES[3]
    assert (rows[4].ne, rows[4].ni, rows[4].np) == (1, 1, 1)
    assert rows[5].red == ""

    # dialect parity: DuckDB's RE2 mirror produces identical output
    con = duckdb.connect()
    for r in rows:
        red, ne, ni, np_ = con.execute(
            f"select {textfns.SQL.redact_pii('$1')},"
            f" {textfns.SQL.pii_count('$1', 'email')},"
            f" {textfns.SQL.pii_count('$1', 'ipv4')},"
            f" {textfns.SQL.pii_count('$1', 'phone')}",
            [CASES[r.i]]).fetchone()
        assert red == r.red, CASES[r.i]
        assert (ne, ni, np_) == (r.ne, r.ni, r.np), CASES[r.i]
