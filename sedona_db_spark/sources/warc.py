"""WARC / WET web-archive source (ISO 28500 — the Common Crawl format).

The front door of a pretraining data pipeline: crawls arrive as
thousands of ~1 GB ``.warc.gz`` / ``.wet.gz`` shards.  Scale shape
follows the format's own design: each shard is a chain of gzip MEMBERS
(one per record), so a single shard decodes strictly sequentially —
parallelism comes from the SHARD level, exactly how every production
WARC reader (warcio, Common Crawl's own tooling) and this engine's
other record formats distribute: ``binaryFile`` scan over the shard
glob, one ``mapInPandas`` batch per shard, records streamed out without
materializing more than one record at a time beyond the gzip window.

Record grammar (ISO 28500 §4): ``WARC/<ver>\\r\\n`` then header lines
``Name: value`` until an empty line, then exactly ``Content-Length``
payload bytes, then ``\\r\\n\\r\\n``.  WET files are ordinary WARC files
whose payload records have ``WARC-Type: conversion`` and text payloads.

Output schema (one row per record):
  path STRING        source shard
  record_id STRING   WARC-Record-ID
  warc_type STRING   warcinfo | request | response | conversion | ...
  url STRING         WARC-Target-URI (null on warcinfo)
  date STRING        WARC-Date
  content_type STRING
  content_length BIGINT
  content BINARY     raw payload bytes
  text STRING        payload decoded UTF-8 (errors replaced) for text/*
                     and application/http payloads; null otherwise

Writer: ``write_warc(df, path)`` emits one gzip member per record
(ISO 28500 annex recommendation), giving byte-faithful read-back — the
roundtrip is pinned by contract query ``warc_read_agg``.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("path string, record_id string, warc_type string, "
               "url string, date string, content_type string, "
               "content_length long, content binary, text string")

_TEXT_TYPES = ("text/", "application/http", "application/xhtml",
               "application/json", "application/warc-fields")


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip stream, yielding one
    bytes blob per member.  Plain (non-gzip) input yields itself."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = d.decompress(data[pos:])
        yield out
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)


def _parse_records(blob: bytes, path: str) -> Iterator[dict]:
    """Parse every WARC record in an uncompressed blob."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos:pos + 2] in (b"\r\n",) :
            pos += 2
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            # not a record boundary: stop parsing this blob (corrupt
            # tail raises loud rather than emitting garbage rows)
            if blob[pos:].strip():
                raise ValueError(
                    f"malformed WARC record at byte {pos} of {path}")
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header in {path}")
        headers: dict[str, str] = {}
        lines = blob[pos:hdr_end].split(b"\r\n")
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        if body_start + length > n:
            # a declared Content-Length past the end of the blob is a
            # truncated shard: raise loud like any other corrupt tail
            # (a silent short read emits a record whose content
            # contradicts its content_length — ADVICE r8)
            raise ValueError(
                f"truncated WARC record at byte {pos} of {path}: "
                f"Content-Length {length} runs past end of data")
        payload = blob[body_start:body_start + length]
        pos = body_start + length
        ctype = headers.get("content-type", "")
        text = None
        if any(ctype.startswith(t) for t in _TEXT_TYPES):
            text = payload.decode("utf-8", "replace")
        yield {
            "path": path,
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date", ""),
            "content_type": ctype,
            "content_length": length,
            "content": payload,
            "text": text,
        }


_OUT_COLS = ["path", "record_id", "warc_type", "url", "date",
             "content_type", "content_length", "content", "text"]


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for p, data in zip(pdf["path"], pdf["content"]):
            for member in _iter_gzip_members(bytes(data)):
                rows.extend(_parse_records(member, p))
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def read_warc(spark: SparkSession, path: str, **options) -> DataFrame:
    """Distributed WARC/WET reader: one task per shard."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(_parse_batches, WARC_SCHEMA)


_BINFILE_SCHEMA = ("path string, modificationTime timestamp, "
                   "length long, content binary")


def read_warc_stream(spark: SparkSession, path: str, **options) -> DataFrame:
    """Structured Streaming WARC/WET reader over a landing directory:
    the file-stream source tracks which shards have been seen (exactly-
    once per shard across restarts via the checkpoint), and each new
    shard flows through the SAME record parser as the batch reader — so
    the whole downstream web pipeline (html_to_text, quality gates, URL
    hygiene: all stateless column expressions) runs on a live crawl
    unchanged.  Batch/stream equivalence is pinned by test."""
    files = spark.readStream.format("binaryFile") \
        .schema(_BINFILE_SCHEMA).load(path) \
        .select("path", "content")
    return files.mapInPandas(_parse_batches, WARC_SCHEMA)


def _record_bytes(r: dict) -> bytes:
    payload = r.get("content") or b""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    hdrs = [
        ("WARC-Type", r.get("warc_type") or "resource"),
        ("WARC-Record-ID",
         r.get("record_id") or f"<urn:uuid:{uuid.uuid4()}>"),
        ("WARC-Date", r.get("date") or "1970-01-01T00:00:00Z"),
        ("Content-Type", r.get("content_type") or
         "application/octet-stream"),
        ("Content-Length", str(len(payload))),
    ]
    if r.get("url"):
        hdrs.insert(3, ("WARC-Target-URI", r["url"]))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in hdrs) + b"\r\n"
    return head + payload + b"\r\n\r\n"


def write_warc(df: DataFrame, path: str, compress: bool = True) -> None:
    """Write one ``.warc[.gz]`` shard per partition (gzip: one member
    per record, the splittability convention Common Crawl uses)."""
    os.makedirs(path, exist_ok=True)
    cols = df.columns
    ext = ".warc.gz" if compress else ".warc"

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        wrote = False
        for pdf in batches:
            for _, row in pdf.iterrows():
                rec = _record_bytes({c: row[c] for c in cols})
                wrote = True
                if compress:
                    buf.write(gzip.compress(rec, mtime=0))
                else:
                    buf.write(rec)
        if wrote:
            name = f"part-{uuid.uuid4().hex}{ext}"
            with open(os.path.join(path, name), "wb") as f:
                f.write(buf.getvalue())
        yield pd.DataFrame({"n": [1 if wrote else 0]})

    df.mapInPandas(write_part, "n int").collect()


# registered in sources/external.py's builtin table (lazy import, the
# same convention every other format follows)
