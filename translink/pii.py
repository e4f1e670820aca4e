"""PII detection and redaction over a document corpus.

Every production training-data pipeline strips or flags personally
identifiable information before the data reaches a model (C4, Dolma and
FineWeb all ship an email/phone/IP pass); this module is that stage for the
``documents(doc_id, text, ...)`` table. The reference engine's analog is its
content-structure analysis pass (``src/pipeline/quick_check.rs:333-370``) —
a per-file classifying scan whose verdict routes the file; here the verdict
is per-document PII counts and a redacted text.

Design constraints:

- **Pure column ops** — ``regexp_count`` / ``regexp_replace`` run inside
  whole-stage codegen; no UDF, no shuffle, scales as a map pass at 100 TB.
- **Portable regex subset** — patterns avoid lookaround and Unicode classes
  so Java regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte; ``\\b``
  is ASCII-word-boundary in both engines' defaults.
- **Fixed redaction order** (email, ssn, phone, ipv4) applied identically in
  Spark and the oracle, so overlapping matches resolve the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ID = "doc_id"

# Category -> (pattern, replacement token). Order matters for redaction:
# email first (an address contains digit runs a later pattern could bite),
# SSN before phone (both are dash-joined digit groups).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+\d{9,15}\b|\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def doc_pii_flags(docs: DataFrame) -> DataFrame:
    """Per-document PII hit counts per category plus a total and a flag.

    One codegen'd map pass over the text column — the counting scan and the
    downstream filter (``has_pii``) both push to the parquet scan.
    """
    text = F.coalesce("text", F.lit(""))
    counts = {
        name: F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    }
    total = None
    for name in counts:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return docs.select(_ID, *counts.values()).select(
        _ID,
        *[f"n_{name}" for name in counts],
        total.alias("n_pii_total"),
        (total > 0).alias("has_pii"),
    )


def doc_pii_redact(docs: DataFrame) -> DataFrame:
    """Replace every PII match with a typed token, in the fixed category
    order. Returns the redacted text plus its md5 (the stable comparison
    handle — downstream dedup keys off the digest, never the text)."""
    red = F.coalesce("text", F.lit(""))
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, F.lit(pat), F.lit(token))
    return docs.select(
        _ID,
        red.alias("redacted_text"),
        F.md5(red).alias("redacted_md5"),
        (red != F.coalesce("text", F.lit(""))).alias("was_redacted"),
    )


def pii_oracle_sql() -> dict[str, str]:
    """DuckDB twins of the two queries, built from the SAME pattern table so
    the regexes can never drift between engines."""
    count_cols = ",\n       ".join(
        f"CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    flags = f"""
WITH c AS (
  SELECT doc_id,
       {count_cols}
  FROM documents
)
SELECT doc_id, {", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS)},
       {total} AS n_pii_total,
       ({total}) > 0 AS has_pii
FROM c
"""
    red = "coalesce(text, '')"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    redact = f"""
SELECT doc_id,
       {red} AS redacted_text,
       md5({red}) AS redacted_md5,
       {red} <> coalesce(text, '') AS was_redacted
FROM documents
"""
    return {"doc_pii_flags": flags, "doc_pii_redact": redact}
