"""Payload sniffing and deterministic charset detection.

Reference behavior being re-expressed (not ported): the reference
routes every fetched payload through ``HtmlParser()(None,
response.content)`` (reference agent/component/invoke.py:92-94) and
turns failures into rows, never task aborts (error-as-row convention,
e.g. reference agent/component/baidu.py:70-71). Here the sniff decides
html vs pdf vs empty, and ``decode_payload`` pins the charset
detection order so extraction is byte-identical across runs and
machines (FIXTURES.md §5.2):

    BOM  >  <meta charset>/<?xml encoding> (strict)  >  UTF-8 strict
         >  latin-1 (total fallback, never fails)

No chardet (not deterministic across versions), stdlib codecs only.
"""

from __future__ import annotations

import codecs
import re

# Failure-code enum — stable ABI for lineage rows (FIXTURES.md §3).
CODE_OK = 0
CODE_EMPTY_PAYLOAD = 10
CODE_ENCODING_UNDETECTABLE = 11
CODE_HTML_PARSE_ERROR = 12
CODE_PDF_TRUNCATED = 20
CODE_PDF_ENCRYPTED = 21
CODE_PDF_LAYOUT_ERROR = 22
CODE_UNKNOWN_PAYLOAD = 90
CODE_INTERNAL = 99

CODE_NAMES = {
    CODE_OK: "OK",
    CODE_EMPTY_PAYLOAD: "EMPTY_PAYLOAD",
    CODE_ENCODING_UNDETECTABLE: "ENCODING_UNDETECTABLE",
    CODE_HTML_PARSE_ERROR: "HTML_PARSE_ERROR",
    CODE_PDF_TRUNCATED: "PDF_TRUNCATED",
    CODE_PDF_ENCRYPTED: "PDF_ENCRYPTED",
    CODE_PDF_LAYOUT_ERROR: "PDF_LAYOUT_ERROR",
    CODE_UNKNOWN_PAYLOAD: "UNKNOWN_PAYLOAD",
    CODE_INTERNAL: "INTERNAL",
}

# Only the first 4 KiB are scanned for a declared charset — mirrors
# the common browser prescan bound and keeps the scan O(1) per page.
_META_SCAN_BYTES = 4096

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9._\-]+)""", re.IGNORECASE
)
_XML_ENCODING_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([A-Za-z0-9._\-]+)["']""", re.IGNORECASE
)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_payload(data: bytes | None) -> str:
    """Classify raw payload bytes: 'pdf' | 'html' | 'empty'.

    Anything that is not empty and not a PDF is treated as (possibly
    broken) HTML/text — the HTML path is the total-function fallback,
    matching the reference's "everything through HtmlParser" behavior
    (reference agent/component/invoke.py:92-94).
    """
    if not data:
        return "empty"
    if data[:5] == b"%PDF-":
        return "pdf"
    return "html"


def _declared_charset(head: bytes) -> str | None:
    m = _META_CHARSET_RE.search(head)
    if m is None:
        m = _XML_ENCODING_RE.search(head)
    if m is None:
        return None
    name = m.group(1).decode("ascii", "replace").strip().lower()
    # Normalize the web-legacy aliases we care about deterministically.
    aliases = {"gb2312": "gbk", "iso-8859-1": "latin-1", "us-ascii": "ascii"}
    return aliases.get(name, name)


def decode_payload(data: bytes) -> tuple[str, str]:
    """bytes -> (text, encoding_used). Never raises.

    Detection order is fixed (FIXTURES.md §5.2). A declared charset
    that fails a *strict* decode is treated as a lie (fixture
    t07_charset_lie) and we fall through; latin-1 is the final
    fallback because it is total over all byte strings.
    """
    for bom, enc in _BOMS:
        if data.startswith(bom):
            try:
                return data.decode(enc), enc
            except UnicodeDecodeError:
                break
    declared = _declared_charset(data[:_META_SCAN_BYTES])
    if declared is not None:
        try:
            return data.decode(declared), declared
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return data.decode("latin-1"), "latin-1"
