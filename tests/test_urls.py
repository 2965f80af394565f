"""URL function library tests (SURVEY.md §2.8; roundtrip properties from
FIXTURES.md §4 G5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from giranking_spark.functions import urls


def _eval(spark, col, values, typ="string"):
    df = spark.createDataFrame([(v,) for v in values], f"x {typ}")
    return [r["y"] for r in df.select(col(F.col("x")).alias("y")).collect()]


def test_url_reverse(spark):
    vals = [
        "http://bar.foo.com:8983/p?a=b",
        "http://www.google.com/",
        "http://www.google.com",
        # fragment and userinfo are dropped: the reference builds row keys
        # from URL.getHost()/getFile() (NutchUtil.java:44-99)
        "http://bar.foo.com/p?a=b#sec2",
        "ftp://user@bar.foo.com/d",
    ]
    assert _eval(spark, urls.url_reverse, vals) == [
        "com.foo.bar:http:8983/p?a=b",
        "com.google.www:http/",
        "com.google.www:http",
        "com.foo.bar:http/p?a=b",
        "com.foo.bar:ftp/d",
    ]


def test_url_unreverse_roundtrip(spark):
    """Roundtrip restores the canonical (fragment/userinfo-free) URL."""
    cases = {
        "http://bar.foo.com:8983/p?a=b": "http://bar.foo.com:8983/p?a=b",
        "http://www.google.com/": "http://www.google.com/",
        "https://a.b.c.example.org/x/y#z": "https://a.b.c.example.org/x/y",
        "http://www.google.com": "http://www.google.com",
        "http://u:pw@x.y.com:81/p": "http://x.y.com:81/p",
    }
    col = lambda c: urls.url_unreverse(urls.url_reverse(c))  # noqa: E731
    assert _eval(spark, col, list(cases)) == list(cases.values())


def test_host_reverse_involution(spark):
    vals = ["www.google.com", "com.google.www", "a.b", "single"]
    assert _eval(spark, urls.host_reverse, vals) == [
        "com.google.www", "www.google.com", "b.a", "single",
    ]
    col = lambda c: urls.host_reverse(urls.host_reverse(c))  # noqa: E731
    assert _eval(spark, col, vals) == vals


def test_url_get_reversed_host(spark):
    assert _eval(spark, urls.url_get_reversed_host, ["com.foo.bar:http:8983/p"]) == ["com.foo.bar"]


def test_url_is_valid_dirty_catalogue(spark):
    """Dirty rows from FIXTURES.md §5."""
    cases = {
        "http://www.google.com/": True,
        "http://": False,            # empty host (LinkRankHBaseTest.java:158)
        "http://invalidurl": False,  # dotless host (:163)
        "dummy": False,              # junk row key (:165)
        "https://x.y:80/p?q=1#f": True,
        "": False,
    }
    got = _eval(spark, urls.url_is_valid, list(cases))
    assert got == list(cases.values())


def test_host_is_valid(spark):
    cases = {"www.google.com": True, "invalidurl": False, "": False}
    got = _eval(spark, urls.host_is_valid, list(cases))
    assert got == list(cases.values())


def test_url_source_detect(spark):
    cases = {
        "com.google.www:http/": "http://www.google.com/",  # reversed -> unreversed
        "http://www.google.com/": "http://www.google.com/",  # already plain
        "dummy": "dummy",  # junk passes through (dropped later by validity filter)
    }
    got = _eval(spark, urls.url_source_detect, list(cases))
    assert got == list(cases.values())


def test_strip_fragment(spark):
    cases = {
        "  http://a.b/p#frag  ": "http://a.b/p",
        "http://a.b/p": "http://a.b/p",
    }
    got = _eval(spark, urls.strip_fragment, list(cases))
    assert got == list(cases.values())
