"""URL canonicalization + PII scrubbing (pure-JVM rewrite chains)."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_duplicate_finder_python_spark.functions.pii import pii_counts, scrub_pii
from video_duplicate_finder_python_spark.functions.urlnorm import canonicalize_url

URL_CASES = [
    (
        "HTTP://WWW.Example.COM:80/Page/Sub/?utm_source=feed&id=3#frag",
        "http://www.example.com/Page/Sub?id=3",
    ),
    ("https://Example.com:443/page/", "https://example.com/page"),
    ("http://example.com/page?utm_campaign=x", "http://example.com/page"),
    ("http://example.com/page?utm_campaign=x&b=2", "http://example.com/page?b=2"),
    # `ref` is NOT stripped by default (content-bearing on real sites,
    # ADVICE r5); callers opt in via tracking_params
    ("http://example.com/?ref=hn", "http://example.com?ref=hn"),
    ("http://example.com/", "http://example.com"),
    ("http://example.com", "http://example.com"),
    ("  http://example.com/a//  ", "http://example.com/a"),
    ("http://example.com:8080/a?gclid=99&q=1", "http://example.com:8080/a?q=1"),
    ("https://h.example.org/p?a=1&fbclid=zz&b=2#x", "https://h.example.org/p?a=1&b=2"),
    ("ftp://Mixed.Case/Path/", "ftp://mixed.case/Path"),
    ("http://example.com/a?utm_a=1&utm_b=2&utm_c=3", "http://example.com/a"),
    ("not a url at all", "not a url at all"),
    ("http://example.com/a/?b=c/", "http://example.com/a?b=c/"),
    ("HTTPS://UP.example.com:443", "https://up.example.com"),
]


def test_canonicalize_url_battery(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in URL_CASES]


def test_canonicalize_url_custom_tracking_params(spark):
    """Sites whose `ref` is genuinely a tracker can opt in per call."""
    from video_duplicate_finder_python_spark.functions.urlnorm import TRACKING_PARAMS

    df = spark.createDataFrame([("http://example.com/?ref=hn&id=2",)], ["url"])
    got = df.select(
        canonicalize_url(F.col("url"), tracking_params=TRACKING_PARAMS + "|ref")
    ).first()[0]
    assert got == "http://example.com?id=2"


def test_canonicalize_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): a canonical form must be a
    fixed point, otherwise two passes over the corpus disagree."""
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("url"))
    twice = [r[0] for r in once.select(canonicalize_url(F.col("url"))).collect()]
    assert twice == [want for _, want in URL_CASES]


def test_scrub_pii_and_counts(spark):
    rows = [
        ("reach me at a.b+1@ex-ample.co.uk or call 555-012-0199 now", 1, 1, 0),
        ("server 10.0.3.250 and 192.168.1.1 are up", 0, 0, 2),
        ("no pii here at all", 0, 0, 0),
        # digits inside the email must not count as phone/ip
        ("mail 555.012.0199x@host.org ok", 1, 0, 0),
        ("x@y.io and 1.2.3.4 and 555 123 4567", 1, 1, 1),
    ]
    df = spark.createDataFrame(rows, ["text", "e", "p", "i"])
    c = pii_counts(F.col("text"))
    got = df.select(
        scrub_pii(F.col("text")).alias("s"),
        c["n_emails"].alias("ne"), c["n_phones"].alias("np"), c["n_ips"].alias("ni"),
        "e", "p", "i",
    ).collect()
    for r in got:
        assert (r["ne"], r["np"], r["ni"]) == (r["e"], r["p"], r["i"]), r
        assert "@" not in r["s"]
    assert got[0]["s"] == "reach me at <EMAIL> or call <PHONE> now"
    assert got[1]["s"] == "server <IP> and <IP> are up"
    assert got[4]["s"] == "<EMAIL> and <IP> and <PHONE>"
