"""WARC writer/parser + crawl-query tests (sources/warc.py, queries/warcq.py)."""

from __future__ import annotations

import pytest

from giranking_spark.sources.warc import (
    encode_http_response,
    encode_warc_record,
    encode_warcinfo,
    parse_warc,
)


def _resp(i: int, body: bytes, status: int = 200) -> bytes:
    return encode_warc_record(
        "response",
        f"resp-{i}",
        encode_http_response(status, "text/html", body),
        "application/http; msgtype=response",
        target_uri=f"http://www.d{i}.example/page/{i}",
    )


def test_single_record_roundtrip():
    raw = _resp(7, b"<html>hello</html>", status=404)
    [rec] = parse_warc(raw)
    assert rec["warc_type"] == "response"
    assert rec["target_uri"] == "http://www.d7.example/page/7"
    assert rec["http_status"] == 404
    assert rec["http_content_type"] == "text/html"
    assert rec["body"] == b"<html>hello</html>"
    assert rec["record_len"] == len(raw)


def test_multi_record_offsets_sum():
    parts = [encode_warcinfo("info-0"), _resp(1, b"a" * 10), _resp(2, b"bb" * 33)]
    recs = parse_warc(b"".join(parts))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert [r["record_len"] for r in recs] == [len(p) for p in parts]
    # offsets reconstruct by summing record_len — the CDX index invariant
    assert sum(r["record_len"] for r in recs) == sum(len(p) for p in parts)


def test_warcinfo_block_is_not_http_parsed():
    [rec] = parse_warc(encode_warcinfo("info-9"))
    assert rec["http_status"] is None
    assert rec["body"] == b""
    assert rec["target_uri"] == ""


def test_stray_crlf_between_records_tolerated():
    raw = _resp(1, b"x") + b"\r\n\r\n" + _resp(2, b"y")
    assert [r["http_status"] for r in parse_warc(raw)] == [200, 200]


@pytest.mark.parametrize("cut", [10, -6, -1])
def test_truncated_record_raises(cut):
    raw = _resp(3, b"payload")
    with pytest.raises(ValueError):
        parse_warc(raw[:cut])


def test_non_warc_bytes_raise():
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")


def test_body_binary_safe():
    body = bytes(range(256)) * 3  # non-ASCII payload bytes survive verbatim
    [rec] = parse_warc(_resp(4, body))
    assert rec["body"] == body


def test_read_warc_explodes_records(spark):
    from pyspark.sql import functions as F

    from giranking_spark.sources.warc import read_warc

    payload = encode_warcinfo("info-5") + _resp(5, b"<html>five</html>")
    df = spark.createDataFrame(
        [(5, bytearray(payload))], "asset_id long, payload binary"
    )
    rows = (
        read_warc(df)
        .orderBy("rec_idx")
        .select("rec_idx", "warc_type", "record_len", "http_status")
        .collect()
    )
    assert [r.warc_type for r in rows] == ["warcinfo", "response"]
    assert rows[1].http_status == 200
    parts = parse_warc(payload)
    assert [r.record_len for r in rows] == [p["record_len"] for p in parts]
    # downstream stays JVM-side: body cast + regexp without Python
    body = (
        read_warc(df)
        .where(F.col("warc_type") == "response")
        .select(F.col("body").cast("string").alias("s"))
        .collect()[0]
        .s
    )
    assert body == "<html>five</html>"


def test_robots_longest_match_semantics(spark):
    """Host 6 carries all three rules (k%3==0, k%2==0, k%5==1): /p/1* is
    re-allowed by the longest rule, other /p/* blocked, non-/p/ paths hit
    the blanket '/' deny."""
    from giranking_spark.queries.warcq import _robots_rules

    rules = {
        (r.prefix, r.allow)
        for r in _robots_rules(spark).where("host_k = 6").collect()
    }
    assert rules == {("/p/", False), ("/p/1", True), ("/", False)}

    def decide(path: str) -> bool:
        matches = [(p, a) for (p, a) in rules if path.startswith(p)]
        if not matches:
            return True
        return sorted(matches, key=lambda x: (-len(x[0]), not x[1]))[0][1]

    assert decide("/p/10-0") is True     # longest match /p/1 allows
    assert decide("/p/20-0") is False    # /p/ denies
    assert decide("/other") is False     # blanket / denies
