"""WARC (Web ARChive, ISO 28500) source: dependency-free writer + reader.

The reference ingests web crawls through Nutch's HBase webpage store
(reference: giraph-nutch/.../LinkRank/io/Nutch2WebpageInputFormat.java:47-211);
the raw-crawl format BEHIND that store is WARC — the format Common Crawl,
Heritrix and Nutch's own segment exporters emit. This module gives the
engine a first-class WARC ingest path so crawl archives can be ranked
without a live HBase cluster:

    encode_warc_record / encode_http_response   deterministic ASCII writer
    parse_warc                                  record walk (header block +
                                                Content-Length body + CRLF*2)
    read_warc                                   Spark reader: one Arrow
                                                mapInPandas pass per archive
                                                payload -> one row per record

Scale posture: parsing is per-archive linear and embarrassingly parallel —
each WARC file (or byte range, at 1 GiB Common-Crawl granularity) is one
task; no shuffle is introduced until the caller aggregates. The parser is
the ONLY Python stage; everything downstream (link extraction, CDX
windowing, robots filtering) stays JVM-side in queries/warcq.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: fixed capture date — archives here are synthesized test fodder; real
#: crawls carry their own WARC-Date which the parser surfaces verbatim.
WARC_DATE = "2026-01-01T00:00:00Z"

_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}


def encode_http_response(status: int, content_type: str, body: bytes) -> bytes:
    """Minimal deterministic HTTP/1.1 response block (ASCII headers)."""
    head = (
        f"HTTP/1.1 {status} {_REASONS[status]}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + body


def encode_warc_record(
    warc_type: str,
    record_id: str,
    block: bytes,
    content_type: str,
    target_uri: str | None = None,
) -> bytes:
    """One WARC/1.0 record: header lines, blank line, block, CRLF CRLF.

    Header content (not order) is what the byte-length oracles reconstruct
    in SQL — keep every line below in sync with queries/warcq.py oracles.
    """
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:giranking:{record_id}>",
        f"WARC-Date: {WARC_DATE}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(block)}")
    head = "\r\n".join(lines) + "\r\n\r\n"
    return head.encode("ascii") + block + b"\r\n\r\n"


def encode_warcinfo(record_id: str) -> bytes:
    """Leading warcinfo record every well-formed archive starts with."""
    fields = b"software: giranking-spark\r\nformat: WARC file version 1.0\r\n"
    return encode_warc_record(
        "warcinfo", record_id, fields, "application/warc-fields"
    )


def parse_warc(buf: bytes) -> list[dict]:
    """Walk concatenated WARC records; returns one dict per record.

    Each dict carries: warc_type, target_uri ('' for non-response types),
    record_len (bytes consumed INCLUDING the trailing CRLF CRLF — offsets
    of consecutive records sum exactly), and for application/http response
    blocks the parsed http_status / http_content_type / body bytes.
    Tolerates stray leading CRLFs between records; raises ValueError on a
    structurally truncated record (no silent partial reads — a short read
    at 100 TB means a corrupt split, not data).
    """
    records: list[dict] = []
    pos, n = 0, len(buf)
    while pos < n:
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        start = pos
        end = buf.find(b"\r\n\r\n", pos)
        if end < 0:
            raise ValueError("truncated WARC header block")
        head = buf[pos:end].decode("ascii")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen_s = hdrs.get("content-length")
        if clen_s is None or not clen_s.isdigit():
            raise ValueError(f"missing/bad WARC Content-Length: {clen_s!r}")
        clen = int(clen_s)
        block_start = end + 4
        if block_start + clen + 4 > n:
            raise ValueError("truncated WARC block")
        block = buf[block_start : block_start + clen]
        pos = block_start + clen + 4
        rec = {
            "warc_type": hdrs.get("warc-type", ""),
            "target_uri": hdrs.get("warc-target-uri", ""),
            "record_len": pos - start,
            "http_status": None,
            "http_content_type": "",
            "body": b"",
        }
        if hdrs.get("content-type", "").startswith("application/http"):
            sep = block.find(b"\r\n\r\n")
            if sep < 0:
                raise ValueError("truncated HTTP block")
            http_lines = block[:sep].decode("ascii").split("\r\n")
            status_parts = http_lines[0].split(" ")
            if len(status_parts) < 2 or not status_parts[1].isdigit():
                raise ValueError(f"bad HTTP status line: {http_lines[0]!r}")
            rec["http_status"] = int(status_parts[1])
            for ln in http_lines[1:]:
                k, _, v = ln.partition(":")
                if k.strip().lower() == "content-type":
                    rec["http_content_type"] = v.strip()
            rec["body"] = block[sep + 4 :]
        records.append(rec)
    return records


READ_WARC_SCHEMA = (
    "archive_id long, rec_idx int, warc_type string, target_uri string, "
    "record_len long, http_status int, http_content_type string, body binary"
)


def read_warc(archives: DataFrame) -> DataFrame:
    """Explode (asset_id, payload) WARC archives into one row per record.

    Single Arrow-batched mapInPandas pass (the sanctioned vectorized Python
    path); record order within an archive is preserved via rec_idx so CDX
    offset windows downstream are deterministic.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "archive_id": [], "rec_idx": [], "warc_type": [],
                "target_uri": [], "record_len": [], "http_status": [],
                "http_content_type": [], "body": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    out["archive_id"].append(int(aid))
                    out["rec_idx"].append(i)
                    out["warc_type"].append(rec["warc_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["record_len"].append(rec["record_len"])
                    out["http_status"].append(rec["http_status"])
                    out["http_content_type"].append(rec["http_content_type"])
                    out["body"].append(rec["body"])
            yield pd.DataFrame(out)

    return archives.select("asset_id", "payload").mapInPandas(
        gen, READ_WARC_SCHEMA
    )
