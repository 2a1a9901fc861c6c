"""Differential tests for PII counting/redaction (Spark vs DuckDB RE2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dft_spark.operators.text import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    pii_counts,
    redact_pii,
)

ROWS = [
    (1, "contact alice.smith+x@example.co.uk or bob@test.org today"),
    (2, "server at 192.168.1.100 and backup at 10.0.0.1 port 8080"),
    (3, "call +1 (555) 123-4567 or 020 7946 0958 now"),
    (4, "mixed: a@b.io, 8.8.8.8, +44 1234 567890, plain words"),
    (5, "no pii here just text about the weather"),
    (6, ""),
]


def _spark_df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def test_counts_match_duckdb(spark, duckcon):
    got = {
        r.id: (r.p.n_emails, r.p.n_phones, r.p.n_ips)
        for r in _spark_df(spark).select("id", pii_counts("text").alias("p")).collect()
    }
    duckcon.execute("CREATE OR REPLACE TABLE pii_rows(id BIGINT, text VARCHAR)")
    duckcon.executemany("INSERT INTO pii_rows VALUES (?, ?)", ROWS)
    want = {
        i: (e, p, ip)
        for i, e, p, ip in duckcon.sql(
            f"""
            SELECT id,
                   len(regexp_extract_all(text, '{PII_EMAIL}')),
                   len(regexp_extract_all(text, '{PII_PHONE}')),
                   len(regexp_extract_all(text, '{PII_IPV4}'))
            FROM pii_rows
            """
        ).fetchall()
    }
    assert got == want
    assert got[1] == (2, 0, 0)
    assert got[2][2] == 2
    assert got[3][1] >= 1
    assert got[5] == (0, 0, 0)


def test_redaction_matches_duckdb(spark, duckcon):
    got = {
        r.id: r.red
        for r in _spark_df(spark).select("id", redact_pii("text").alias("red")).collect()
    }
    duckcon.execute("CREATE OR REPLACE TABLE pii_rows(id BIGINT, text VARCHAR)")
    duckcon.executemany("INSERT INTO pii_rows VALUES (?, ?)", ROWS)
    want = dict(
        duckcon.sql(
            f"""
            SELECT id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{PII_EMAIL}', '[PII]', 'g'),
                       '{PII_IPV4}', '[PII]', 'g'),
                       '{PII_PHONE}', '[PII]', 'g')
            FROM pii_rows
            """
        ).fetchall()
    )
    assert got == want


def test_redaction_removes_every_counted_match(spark):
    red = _spark_df(spark).select(
        "id", redact_pii("text").alias("text")
    )
    counts = red.select("id", pii_counts("text").alias("p")).collect()
    for r in counts:
        assert (r.p.n_emails, r.p.n_phones, r.p.n_ips) == (0, 0, 0), r


def test_non_pii_text_untouched(spark):
    row = (
        _spark_df(spark)
        .filter(F.col("id") == 5)
        .select(redact_pii("text").alias("red"))
        .first()
    )
    assert row.red == ROWS[4][1]
