"""PII redaction (operators/pii.py) over a seeded synthetic corpus (the
driver corpus contains no PII-shaped strings — verified — so this operator
gets a pytest differential against DuckDB instead of a catalog oracle)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from seo_audit_etl_actor_spark.operators import pii

DOCS = [
    (0, "a", "contact bob.smith+x@example.org or jane@sub.domain.co for info"),
    (1, "a", "call +1 (555) 123-4567 today"),
    (2, "a", "server at 192.168.0.1 and 10.0.0.255 responded"),
    (3, "b", "mixed: a@b.io then 8005551234 then 8.8.8.8 done"),
    (4, "b", "clean document with no identifiers at all"),
    (5, "b", ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, source: string, text: string")


def test_redaction_removes_every_match(spark):
    red = _df(spark).select(pii.redact_pii(F.col("text")).alias("t"))
    for pat in pii.PATTERNS.values():
        assert red.where(F.regexp_count("t", F.lit(pat)) > 0).count() == 0
    texts = {r["t"] for r in red.collect()}
    assert "contact <EMAIL> or <EMAIL> for info" in texts
    assert "server at <IP> and <IP> responded" in texts


def test_stats_match_duckdb_twin(spark):
    got = [tuple(r) for r in pii.pii_stats(_df(spark)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", DOCS)
    # sequential-stage counts, mirroring pii_stats: email on raw text, ip
    # on email-redacted text, phone after both
    after_email = f"regexp_replace(text, '{pii.EMAIL_RE}', '<EMAIL>', 'g')"
    after_ip = f"regexp_replace({after_email}, '{pii.IPV4_RE}', '<IP>', 'g')"
    fams = [
        ("email", pii.EMAIL_RE, "text"),
        ("phone", pii.PHONE_RE, after_ip),
        ("ip", pii.IPV4_RE, after_email),
    ]
    cols = []
    for k, p, src in fams:
        cols.append(
            f"CAST(SUM(CASE WHEN len(regexp_extract_all({src}, '{p}')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_{k}"
        )
        cols.append(f"CAST(SUM(len(regexp_extract_all({src}, '{p}'))) AS BIGINT) AS total_{k}")
    redacted = "regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'), '{p}', '<PHONE>', 'g')".format(
        e=pii.EMAIL_RE, i=pii.IPV4_RE, p=pii.PHONE_RE
    )
    want = con.execute(
        f"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, {', '.join(cols)},
                   CAST(SUM(len(text) - len({redacted})) AS BIGINT) AS chars_redacted
            FROM docs GROUP BY source ORDER BY source"""
    ).fetchall()
    assert got == [tuple(r) for r in want]
