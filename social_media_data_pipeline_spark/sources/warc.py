"""WARC (ISO 28500) web-archive source — Common-Crawl-style ingestion.

An LLM training corpus starts as WARC files: web captures framed as
typed records (request/response/warcinfo/metadata) with named headers
and content-length payloads, usually one gzip member per record so
archives are seekable. The reference pipeline scrapes its feed
directly (`Scraping/*.py`); this module supplies the bulk-archive
ingestion path the same preprocessing chain runs on at 100 TB: a
binaryFile scan of `.warc` / `.warc.gz` shards, per-file record
parsing in an Arrow-batched `mapInPandas` (each shard parses
independently — the natural 1-file-1-task layout Common Crawl ships),
HTTP header/body split for response records, and typed columns ready
for the dedup/quality/decontamination operators.

Format notes (public ISO 28500 / WARC 1.0-1.1):
- record = version line `WARC/1.x` CRLF, header lines `Name: value`
  CRLF..., blank CRLF line, exactly `Content-Length` payload bytes,
  then CRLF CRLF before the next record;
- gzipped archives concatenate one gzip MEMBER per record — zlib with
  window 47 decodes member-by-member (offsets preserved);
- a `response` record's payload is an HTTP message: status line +
  headers, CRLF CRLF, body. The DOCUMENT is the body; status and
  Content-Type come from the HTTP headers, URL/date from the WARC
  headers.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def _split_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member-by-member (each
    WARC record is its own member); pass through if not gzip."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(47)
        chunk = d.decompress(data[pos:])
        yield chunk + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """All records of a (possibly gzipped) WARC file: dicts with
    `headers` (dict, case-insensitive keys lowered) and `payload`
    (bytes). Framing errors raise — a truncated shard should be
    REPORTED, not silently half-read."""
    for member in _split_members(bytes(data)):
        pos = 0
        n = len(member)
        while pos < n:
            # tolerate inter-record CRLF padding
            while member[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            eol = member.index(_CRLF, pos)
            version = member[pos:eol].decode("ascii", "replace")
            if not version.startswith("WARC/"):
                raise ValueError(f"bad WARC version line at byte {pos}: {version!r}")
            pos = eol + 2
            headers: dict[str, str] = {}
            while member[pos : pos + 2] != _CRLF:
                eol = member.index(_CRLF, pos)
                line = member[pos:eol].decode("utf-8", "replace")
                name, _, value = line.partition(":")
                headers[name.strip().lower()] = value.strip()
                pos = eol + 2
            pos += 2  # blank line
            try:
                length = int(headers["content-length"])
            except KeyError:
                raise ValueError("WARC record missing Content-Length") from None
            payload = member[pos : pos + length]
            if len(payload) != length:
                raise ValueError("truncated WARC record payload")
            pos += length
            yield {"version": version, "headers": headers, "payload": payload}


def split_http_response(payload: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """(status, headers, body) of an HTTP response payload; (None, {},
    payload) if it does not look like HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        return None, {}, payload
    head_lines = payload[:head_end].split(_CRLF)
    try:
        status = int(head_lines[0].split()[1])
    except (IndexError, ValueError):
        return None, {}, payload
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        name, _, value = line.decode("latin-1").partition(":")
        headers[name.strip().lower()] = value.strip()
    return status, headers, payload[head_end + 4 :]


WARC_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC shards → one row per record of the requested `types`, HTTP
    split applied to responses. Each shard parses in its own task
    (map-side, Arrow-batched); at 100 TB the shard list IS the
    parallelism, exactly how Common Crawl is laid out. Compose the
    result with `functions.text` quality scoring and the dedup family —
    `body` decodes with `F.decode` for text/* content types."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("path", "content")

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "")
                    if types and wtype not in types:
                        continue
                    status, http_h, body = (
                        split_http_response(rec["payload"])
                        if wtype == "response"
                        else (None, {}, rec["payload"])
                    )
                    rows.append(
                        {
                            "shard": path_.rsplit("/", 1)[-1],
                            "record_id": h.get("warc-record-id", ""),
                            "warc_type": wtype,
                            "url": h.get("warc-target-uri", ""),
                            "warc_date": h.get("warc-date", ""),
                            "http_status": status,
                            "content_type": http_h.get(
                                "content-type", h.get("content-type", "")
                            ),
                            "length": len(body),
                            "body": body,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(_parse, WARC_SCHEMA)


# ------------------------------------------------------- writer (tests)


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Scriptable WARC writer: each dict needs `warc_type`, optional
    `url`, `payload` (bytes), extra headers via `headers`. With
    `gzip_members`, every record becomes its own gzip member (the
    Common Crawl convention the reader's member-splitter exercises)."""
    out = bytearray()
    for i, r in enumerate(records):
        headers = {
            "WARC-Type": r["warc_type"],
            "WARC-Record-ID": r.get("record_id", f"<urn:uuid:rec-{i}>"),
            "WARC-Date": r.get("date", "2024-01-01T00:00:00Z"),
            "Content-Length": str(len(r["payload"])),
        }
        if r.get("url"):
            headers["WARC-Target-URI"] = r["url"]
        headers.update(r.get("headers", {}))
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            rec += f"{k}: {v}\r\n".encode()
        rec += b"\r\n" + r["payload"] + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
