"""PII redaction (Dolma-style masks) + URL canonicalization/dedup
(CCNet/RefinedWeb crawl-dedup step)."""

from __future__ import annotations

import pyspark.sql.functions as F

from loongcollector_spark.dataops.text import normalize_url, pii_redact, url_dedup


def test_pii_redact_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "write bob.smith+x@corp-mail.example.com or 415-555-0001"),
            (2, "host 192.168.1.254 and 10.0.0.1; ping me"),
            (3, "clean text with 1.2 version and a@b (no tld)"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert rows[1]["redacted"] == "write |||EMAIL_ADDRESS||| or |||PHONE_NUMBER|||"
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ip"]) == (1, 1, 0)
    assert rows[2]["redacted"] == "host |||IP_ADDRESS||| and |||IP_ADDRESS|||; ping me"
    assert rows[2]["n_ip"] == 2
    assert rows[3]["redacted"] == rows[3]["redacted"] == docs.collect()[2]["text"]
    assert (rows[3]["n_email"], rows[3]["n_phone"], rows[3]["n_ip"]) == (0, 0, 0)


def test_normalize_url(spark):
    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&b=2&a=1#frag",
         "http://www.ex.com/A/b?a=1&b=2"),
        ("https://h.io:443/p", "https://h.io/p"),
        ("https://h.io:8443/p", "https://h.io:8443/p"),  # non-default port kept
        ("http://h.io/p?utm_campaign=1&fbclid=2&gclid=3&ref=4", "http://h.io/p"),
        ("http://h.io", "http://h.io"),
        ("http://h.io/", "http://h.io/"),  # bare root slash kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_newest_wins_min_id_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://a.com/x?utm_source=s", 5),
            (2, "HTTP://A.COM:80/x", 9),   # same canonical, newer → survives
            (3, "http://a.com/x/", 9),     # tie on ts with 2 → min id = 2
            (4, "http://b.com/y", 1),
        ],
        "doc_id long, url string, fetch_ts long",
    )
    out = {r["canonical_url"]: r["doc_id"] for r in url_dedup(docs, priority_col="fetch_ts").collect()}
    assert out == {"http://a.com/x": 2, "http://b.com/y": 4}
