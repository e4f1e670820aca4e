"""PII detection/redaction and per-source curation stats.

Reference analog: the content-classifying scan whose verdict routes a file
(``src/pipeline/quick_check.rs:333-370``); here the verdict is per-document
PII counts / redacted text and per-source aggregate health.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from translink.pii import doc_pii_flags, doc_pii_redact, pii_oracle_sql
from translink.textops import doc_source_stats


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "contact me at alice.smith+spam@example.co.uk for details", "en", "web"),
        (1, "my ssn is 123-45-6789 and my phone is 555-867-5309", "en", "web"),
        (2, "server at 192.168.1.254 answered, backup at 10.0.0.1", "en", "logs"),
        (3, "call +4915123456789 tomorrow", "de", "web"),
        (4, "no sensitive content here, just plain prose", "en", "books"),
        (5, "", "en", "books"),
        (6, None, "en", "books"),
        (7, "two mails: a@b.io c@d.org and ip 8.8.8.8", "en", "logs"),
        (8, "version 1.2.3.4 of the parser", "en", "web"),  # ipv4-shaped
        (9, "no sensitive content here, just plain prose", "en", "books"),  # dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_pii_counts(pii_docs):
    got = {r["doc_id"]: r.asDict() for r in doc_pii_flags(pii_docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_pii_total"] == 1
    assert got[1]["n_ssn"] == 1 and got[1]["n_phone"] == 1 and got[1]["n_pii_total"] == 2
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_phone"] == 1
    assert got[4]["n_pii_total"] == 0 and got[4]["has_pii"] is False
    assert got[5]["n_pii_total"] == 0
    assert got[6]["n_pii_total"] == 0  # null text is no-PII, not an error
    assert got[7]["n_email"] == 2 and got[7]["n_ipv4"] == 1
    assert got[8]["n_ipv4"] == 1  # honest limitation: version strings look like IPs
    assert all(g["has_pii"] == (g["n_pii_total"] > 0) for g in got.values())


def test_pii_redact(pii_docs):
    got = {r["doc_id"]: r.asDict() for r in doc_pii_redact(pii_docs).collect()}
    assert got[0]["redacted_text"] == "contact me at <EMAIL> for details"
    assert got[1]["redacted_text"] == "my ssn is <SSN> and my phone is <PHONE>"
    assert got[2]["redacted_text"] == "server at <IP> answered, backup at <IP>"
    assert got[3]["redacted_text"] == "call <PHONE> tomorrow"
    assert got[4]["was_redacted"] is False
    assert got[6]["redacted_text"] == ""  # null -> empty, never None
    assert got[7]["redacted_text"] == "two mails: <EMAIL> <EMAIL> and ip <IP>"


def test_pii_oracle_parity_on_planted_docs(pii_docs):
    """The generated DuckDB SQL and the Spark queries agree row-for-row on
    the planted corpus — the same check the driver runs at sf0.01, but over
    text that actually CONTAINS PII."""
    pdf = pii_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for name, q in (("doc_pii_flags", doc_pii_flags), ("doc_pii_redact", doc_pii_redact)):
        spark_rows = sorted(tuple(r) for r in q(pii_docs).collect())
        ora = con.execute(pii_oracle_sql()[name]).fetchall()
        assert spark_rows == sorted(tuple(r) for r in ora), name


def test_source_stats(pii_docs):
    got = {r["source"]: r.asDict() for r in doc_source_stats(pii_docs).collect()}
    assert got["web"]["n_docs"] == 4 and got["web"]["n_unique_texts"] == 4
    assert got["web"]["dup_frac"] == 0.0
    # books: docs 4, 5, 6, 9 -> texts ("no sensitive...", "", "", "no sensitive...")
    # null coalesces to "" so 2 unique texts across 4 docs
    assert got["books"]["n_docs"] == 4 and got["books"]["n_unique_texts"] == 2
    assert got["books"]["dup_frac"] == 0.5
    assert got["books"]["min_chars"] == 0
    assert got["logs"]["total_chars"] == sum(
        len(t) for t in ("server at 192.168.1.254 answered, backup at 10.0.0.1",
                         "two mails: a@b.io c@d.org and ip 8.8.8.8")
    )


def test_url_stats(spark):
    from translink.textops import doc_url_stats

    rows = [
        (0, "see https://example.com/a and http://example.com/b plus https://other.org", "en", "web"),
        (1, "no links at all in this prose", "en", "web"),
        (2, "https://x.io", "en", "web"),   # document that IS one link
        (3, None, "en", "web"),
        (4, "", "en", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t, l, s, len(t or "")) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in doc_url_stats(df).collect()}
    assert got[0]["n_urls"] == 3
    assert got[0]["n_unique_hosts"] == 2            # example.com counted once
    assert 0 < got[0]["url_char_frac"] < 1
    assert got[1]["n_urls"] == 0 and got[1]["url_char_frac"] == 0.0
    assert got[2]["n_urls"] == 1 and got[2]["url_char_frac"] == 1.0
    assert got[3]["n_urls"] == 0 and got[4]["n_urls"] == 0
