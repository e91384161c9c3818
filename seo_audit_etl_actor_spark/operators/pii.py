"""PII detection / redaction for training-data pipelines (engine extension
surface; absent from the reference). Emails, phone numbers, and IPv4
addresses are matched with patterns written in the regex intersection both
Java (Spark) and RE2 (DuckDB/oracle) execute identically — no lookbehind,
no backreferences — so detection counts are engine-portable.

Scale design: pure map-side `regexp_*` expressions — whole-stage codegen,
zero shuffles for redaction itself; the stats rollup shuffles one small
counts row per partition. Redaction REPLACES in place (constant-token
masking), so downstream tokenization sees stable placeholder tokens.

The driver's synthetic corpus contains no PII-shaped strings (verified —
an oracle query here would be vacuous), so this operator is validated by
pytest over a seeded synthetic corpus instead (tests/test_pii.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java+RE2-portable patterns (no \b needed: the char classes self-delimit)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()\-]{6,}[0-9]"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

MASKS = {"email": "<EMAIL>", "phone": "<PHONE>", "ip": "<IP>"}
PATTERNS = {"email": EMAIL_RE, "phone": PHONE_RE, "ip": IPV4_RE}


def redact_pii(text: Column) -> Column:
    """All three patterns masked with constant tokens. Order matters: IPv4
    before phone (an IP is phone-shaped once dots are the only separators
    left out), email first (its local part may contain digits)."""
    out = F.regexp_replace(text, EMAIL_RE, MASKS["email"])
    out = F.regexp_replace(out, IPV4_RE, MASKS["ip"])
    out = F.regexp_replace(out, PHONE_RE, MASKS["phone"])
    return out


def pii_stats(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group PII exposure report: docs containing each PII family,
    total match counts, and redacted-character volume.

    Counts are taken at each SEQUENTIAL redaction stage (email on the raw
    text, ip on the email-redacted text, phone after both) so every count
    is exactly what redact_pii masks at that stage — counting all families
    on raw text would claim phone exposure inside an email's local part
    that redaction never touches.
    """
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, MASKS["email"])
    after_ip = F.regexp_replace(after_email, IPV4_RE, MASKS["ip"])
    counts = {
        "email": F.regexp_count(t, F.lit(EMAIL_RE)),
        "ip": F.regexp_count(after_email, F.lit(IPV4_RE)),
        "phone": F.regexp_count(after_ip, F.lit(PHONE_RE)),
    }
    scored = docs.select(
        F.col(group_col),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        (F.length(t) - F.length(redact_pii(t))).alias("chars_delta"),
    )
    aggs = []
    for k in PATTERNS:
        aggs.append(F.sum((F.col(f"n_{k}") > 0).cast("long")).alias(f"docs_with_{k}"))
        aggs.append(F.sum(f"n_{k}").alias(f"total_{k}"))
    return (
        scored.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), *aggs, F.sum("chars_delta").alias("chars_redacted"))
        .orderBy(group_col)
    )
