"""Minimal WARC 1.0 reader/writer for Common-Crawl-style archives.

WARC is the on-the-wire format a crawl actually lands in (ISO 28500,
public spec; Common Crawl publishes per-record-gzipped `.warc.gz`
segments). This module gives the engine a real ingestion edge:
``parse_warc`` turns raw segment bytes into pages-schema records and
``build_warc`` emits test fixtures — both pure functions, no I/O, so
they ride the same mapInPandas vectorization as every other kernel.

Format subset handled (everything else is skipped, never raises):
- plain or gzip input; multi-member gzip (CC's per-record members) and
  whole-file gzip both decode (zlib with gzip wrapper, streamed).
- `WARC/1.0` / `WARC/1.1` records; `WARC-Type: response` and
  `resource` records yield pages (HTTP response headers, if present,
  are stripped to expose the payload body); `conversion` records —
  the WET extracted-text sibling format CC publishes — yield
  plain-text payloads when requested via ``record_types``.
- `WARC-Target-URI` and `WARC-Date` (ISO-8601) map to (url, warc_ts).

Error containment mirrors the pipeline convention: malformed records
are skipped and counted, never raised (error-as-row discipline lives
downstream in the extraction kernel).
"""

from __future__ import annotations

import datetime as _dt
import zlib
from dataclasses import dataclass

CRLF = b"\r\n"


@dataclass
class WarcRecord:
    url: str
    warc_ts: _dt.datetime | None
    payload: bytes
    rec_type: str


def _gunzip_all(data: bytes) -> bytes:
    """Decompress possibly multi-member gzip; plain bytes pass through."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _s, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1", "replace")
            )
    return headers


def _parse_warc_date(s: str) -> _dt.datetime | None:
    try:
        return _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=_dt.timezone.utc
        )
    except ValueError:
        return None


def _strip_http_headers(payload: bytes) -> bytes:
    """response records carry an HTTP message; body starts after the
    first blank line."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep != -1:
            return payload[sep + 4 :]
    return payload


def parse_warc(
    data: bytes,
    record_types: tuple[str, ...] = ("response", "resource"),
) -> tuple[list[WarcRecord], int]:
    """Raw segment bytes -> (records, n_skipped). Never raises.
    ``record_types`` selects which WARC record types become rows —
    ("conversion",) reads WET extracted-text segments."""
    records: list[WarcRecord] = []
    skipped = 0
    try:
        raw = _gunzip_all(bytes(data))
    except zlib.error:
        return [], 1
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/1.", pos)
        if start == -1:
            break
        hdr_end = raw.find(b"\r\n\r\n", start)
        if hdr_end == -1:
            skipped += 1
            break
        headers = _parse_headers(raw[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            skipped += 1
            pos = hdr_end + 4
            continue
        body = raw[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get("warc-type", "")
        if rec_type not in record_types:
            continue  # warcinfo/request/metadata records: not pages
        url = headers.get("warc-target-uri", "")
        if not url:
            skipped += 1
            continue
        payload = _strip_http_headers(body) if rec_type == "response" else body
        records.append(
            WarcRecord(
                url=url,
                warc_ts=_parse_warc_date(headers.get("warc-date", "")),
                payload=payload,
                rec_type=rec_type,
            )
        )
    return records, skipped


def build_warc(
    pages: list[tuple[str, _dt.datetime, bytes]],
    per_record_gzip: bool = True,
    with_http_headers: bool = True,
) -> bytes:
    """pages [(url, ts, payload)] -> CC-style .warc(.gz) segment bytes.
    Deterministic (no uuids/wall clock — record ids derive from the
    url), used for fixtures and round-trip tests."""
    out = bytearray()
    for url, ts, payload in pages:
        if with_http_headers:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
            )
            body = http + bytes(payload)
        else:
            body = bytes(payload)
        ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + url.encode() + b"\r\n"
            + b"WARC-Date: " + ts_s.encode() + b"\r\n"
            + b"WARC-Record-ID: <urn:uri:" + url.encode() + b">\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
            + b"\r\n\r\n"
        )
        if per_record_gzip:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def build_wet(
    docs: list[tuple[str, _dt.datetime, str]], per_record_gzip: bool = True
) -> bytes:
    """docs [(url, ts, text)] -> CC-style .wet(.gz) segment bytes
    (WARC conversion records, text/plain payloads). Deterministic —
    fixture/round-trip companion to ``build_warc``."""
    out = bytearray()
    for url, ts, text in docs:
        body = text.encode("utf-8")
        ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + b"WARC-Target-URI: " + url.encode() + b"\r\n"
            + b"WARC-Date: " + ts_s.encode() + b"\r\n"
            + b"WARC-Record-ID: <urn:uri:" + url.encode() + b">\r\n"
            + b"Content-Type: text/plain\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
            + b"\r\n\r\n"
        )
        if per_record_gzip:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)
