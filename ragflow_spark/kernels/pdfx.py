"""Minimal from-scratch PDF text extraction with layout heuristics.

The reference's PDF path (``deepdoc/parser/pdf_parser.py``: OCR boxes
-> layout classes -> text merge) is NOT in the checkout (SURVEY.md
§0.2 [NOT IN CHECKOUT]); no PDF library is available in this
environment either, so this is a deterministic geometric re-expression
of the same idea (SURVEY.md §7.3.3 scopes it to non-ML heuristics):

  1. structural scan: %PDF- header, %%EOF trailer (missing ->
     PDF_TRUNCATED), /Encrypt in any trailer dict (-> PDF_ENCRYPTED)
  2. content streams: every ``stream ... endstream`` object, Flate
     (zlib) decoded when /Filter /FlateDecode
  3. text ops: a tiny tokenizer over the content stream collects
     (x, y, string) from Td/TD/Tm cursor ops + Tj/TJ/'/" show ops
  4. layout: per page, lines sorted by (-y, x); two-column detection
     by x-gap clustering (read left column fully, then right);
     header/footer suppression: identical text repeated at the same
     extreme y band across >= 2 pages is dropped
  5. table structure: >= MIN_TABLE_COLS text runs sharing one baseline
     y, across >= 2 consecutive baselines sharing the same x-grid,
     form a table block; each baseline becomes a ("row", cell\tcell…)
     section (same convention as the HTML <tr> path). Exactly two
     x-clusters stay two-COLUMN text, not a 2-col table — the
     deterministic disambiguation rule (north_star: "table-structure
     parsing for PDF payloads").
  6. sections: one per assembled text line, normalized like HTML text

Handles exactly the PDF feature set our deterministic generator
(ragflow_spark/sources/pdfgen.py) emits plus graceful failure codes
for everything else (error-as-row, FIXTURES.md §3).
"""

from __future__ import annotations

import re
import zlib

from ragflow_spark.kernels.htmlx import normalize_text
from ragflow_spark.kernels.sniff import (
    CODE_OK,
    CODE_PDF_ENCRYPTED,
    CODE_PDF_LAYOUT_ERROR,
    CODE_PDF_TRUNCATED,
)

# dict immediately preceding the `stream` keyword (one nesting level),
# body bounded by /Length when present — compressed bytes may contain
# `endstream` by coincidence, so a lazy scan to the marker is unsafe.
_STREAM_HDR_RE = re.compile(
    rb"<<((?:[^<>]|<<[^<>]*>>)*)>>\s*stream\r?\n", re.DOTALL
)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _iter_streams(data: bytes):
    for m in _STREAM_HDR_RE.finditer(data):
        d = m.group(1)
        start = m.end()
        lm = _LENGTH_RE.search(d)
        if lm:
            body = data[start : start + int(lm.group(1))]
        else:
            e = data.find(b"endstream", start)
            body = data[start : e if e != -1 else len(data)].rstrip(b"\r\n")
        yield d, body

# content-stream tokens we care about
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

PAGE_HEIGHT_DEFAULT = 792.0  # US Letter points
HEADER_BAND = 0.92  # y above height*band = header candidate
FOOTER_BAND = 0.08
TWO_COL_MIN_GAP = 120.0  # pt gap between x clusters => two columns


def _unescape_pdf_string(raw: bytes) -> str:
    if b"\\" not in raw:  # fast path: no escapes (the common case)
        return raw.decode("latin-1")
    out = []
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            mapping = {
                ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
                ord("b"): "\b", ord("f"): "\f",
                ord("("): "(", ord(")"): ")", ord("\\"): "\\",
            }
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(chr(int(oct_digits, 8)))
                i = j
                continue
            i += 1
            continue
        out.append(chr(c))
        i += 1
    return "".join(out)


def _iter_strings_with_pos_reference(content: bytes):
    """Reference byte-at-a-time tokenizer — behavioral oracle for the
    regex-scanning _iter_strings_with_pos below (differential-tested
    in tests/test_pdf.py); not used in the hot path."""
    i = 0
    n = len(content)
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    num_stack: list[float] = []
    pending_str: str | None = None
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                ch = content[j]
                if ch == 0x5C and j + 1 < n:
                    buf += content[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(ch)
                j += 1
            pending_str = _unescape_pdf_string(bytes(buf))
            i = j + 1
            continue
        if c.isspace():
            i += 1
            continue
        m = _NUM_RE.match(content, i)
        if m and m.start() == i:
            num_stack.append(float(m.group()))
            i = m.end()
            continue
        # operator token
        j = i
        while j < n and not content[j : j + 1].isspace() and content[j : j + 1] not in (b"(", b"[", b"]"):
            j += 1
        op = content[i:j] if j > i else c
        if j == i:
            j = i + 1
        if op == b"Td" and len(num_stack) >= 2:
            line_x += num_stack[-2]
            line_y += num_stack[-1]
            x, y = line_x, line_y
        elif op == b"TD" and len(num_stack) >= 2:
            leading = -num_stack[-1]
            line_x += num_stack[-2]
            line_y += num_stack[-1]
            x, y = line_x, line_y
        elif op == b"Tm" and len(num_stack) >= 6:
            line_x, line_y = num_stack[-2], num_stack[-1]
            x, y = line_x, line_y
        elif op == b"TL" and num_stack:
            leading = num_stack[-1]
        elif op == b"T*":
            line_y -= leading
            x, y = line_x, line_y
        elif op == b"BT":
            x = y = line_x = line_y = 0.0
        elif op in (b"Tj", b"'", b'"') and pending_str is not None:
            if op != b"Tj":
                line_y -= leading
                x, y = line_x, line_y
            yield (x, y, pending_str)
            pending_str = None
        elif op == b"TJ":
            # array form: strings already captured one by one — the
            # generator never emits TJ, treat like Tj of last string
            if pending_str is not None:
                yield (x, y, pending_str)
                pending_str = None
        num_stack.clear()
        i = j
    return


_WS_SKIP_RE = re.compile(rb"\s+")
_OP_TOK_RE = re.compile(rb"[^\s(\[\]]+")  # ')' is NOT a stop byte in the reference scan
_STR_SPECIAL_RE = re.compile(rb"[\\()]")


def _iter_strings_with_pos(content: bytes):
    """Yield (x, y, text) for each text-showing op, tracking the text
    cursor through BT/ET blocks (Td/TD relative moves, Tm absolute).

    Regex-scanning port of _iter_strings_with_pos_reference: whitespace
    runs, operator tokens and string bodies advance by C-speed regex
    scans instead of one Python iteration per byte (~8x on MB-scale
    decompressed content streams — the dominant PDF cost)."""
    i = 0
    n = len(content)
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    num_stack: list[float] = []
    pending_str: str | None = None
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                m = _STR_SPECIAL_RE.search(content, j)
                if not m:
                    buf += content[j:n]
                    j = n
                    break
                k = m.start()
                buf += content[j:k]
                ch = content[k]
                if ch == 0x5C and k + 1 < n:
                    buf += content[k : k + 2]
                    j = k + 2
                elif ch == 0x28:
                    depth += 1
                    buf.append(ch)
                    j = k + 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        j = k
                        break
                    buf.append(ch)
                    j = k + 1
                else:  # trailing lone backslash at EOF
                    buf.append(ch)
                    j = k + 1
            pending_str = _unescape_pdf_string(bytes(buf))
            i = j + 1
            continue
        m = _WS_SKIP_RE.match(content, i)
        if m:
            i = m.end()
            continue
        m = _NUM_RE.match(content, i)
        if m and m.start() == i:
            num_stack.append(float(m.group()))
            i = m.end()
            continue
        m = _OP_TOK_RE.match(content, i)
        if m:
            op = m.group()
            j = m.end()
        else:  # '[' or ']'
            op = c
            j = i + 1
        if op == b"Td" and len(num_stack) >= 2:
            line_x += num_stack[-2]
            line_y += num_stack[-1]
            x, y = line_x, line_y
        elif op == b"TD" and len(num_stack) >= 2:
            leading = -num_stack[-1]
            line_x += num_stack[-2]
            line_y += num_stack[-1]
            x, y = line_x, line_y
        elif op == b"Tm" and len(num_stack) >= 6:
            line_x, line_y = num_stack[-2], num_stack[-1]
            x, y = line_x, line_y
        elif op == b"TL" and num_stack:
            leading = num_stack[-1]
        elif op == b"T*":
            line_y -= leading
            x, y = line_x, line_y
        elif op == b"BT":
            x = y = line_x = line_y = 0.0
        elif op in (b"Tj", b"'", b'"') and pending_str is not None:
            if op != b"Tj":
                line_y -= leading
                x, y = line_x, line_y
            yield (x, y, pending_str)
            pending_str = None
        elif op == b"TJ":
            if pending_str is not None:
                yield (x, y, pending_str)
                pending_str = None
        num_stack.clear()
        i = j
    return


def _decode_stream(dict_bytes: bytes, body: bytes) -> bytes | None:
    if b"FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(body)
        except zlib.error:
            return None
    if b"/Filter" in dict_bytes:
        return None  # unsupported filter — skip (non-text streams)
    return body


MIN_TABLE_COLS = 3  # >=3 aligned runs per baseline -> table row
MIN_TABLE_ROWS = 2  # >=2 consecutive aligned baselines -> table block
_X_QUANT = 1.0  # x positions equal when rounded to this grid


def _baselines(items: list[tuple[float, float, str]]):
    """Group items by baseline y (rounded), each line's runs sorted by
    x; returned top-down (-y)."""
    by_y: dict[float, list[tuple[float, str]]] = {}
    for x, y, s in items:
        by_y.setdefault(round(y, 1), []).append((x, s))
    return [
        (y, sorted(runs, key=lambda t: t[0]))
        for y, runs in sorted(by_y.items(), key=lambda kv: -kv[0])
    ]


def _table_blocks(lines) -> set[float]:
    """Baseline ys that belong to a table block: runs of >=
    MIN_TABLE_ROWS consecutive baselines, each with >= MIN_TABLE_COLS
    runs, consecutive baselines sharing >= MIN_TABLE_COLS-1 x
    positions (the aligned grid)."""
    ys: set[float] = set()
    run: list[tuple[float, frozenset]] = []

    def flush():
        if len(run) >= MIN_TABLE_ROWS:
            ys.update(y for y, _g in run)
        run.clear()

    for y, runs in lines:
        grid = frozenset(round(x / _X_QUANT) for x, _s in runs)
        if len(runs) >= MIN_TABLE_COLS:
            if run and len(run[-1][1] & grid) < MIN_TABLE_COLS - 1:
                flush()
            run.append((y, grid))
        else:
            flush()
    flush()
    return ys


def _cluster_two_columns(xs: list[float]) -> float | None:
    """If line x-origins form two clusters separated by a wide gap,
    return the split x; else None. Deterministic: largest gap wins,
    ties broken by lower x."""
    uniq = sorted(set(xs))
    if len(uniq) < 2:
        return None
    best_gap = 0.0
    best_mid = None
    for a, b in zip(uniq, uniq[1:]):
        gap = b - a
        if gap > best_gap:
            best_gap = gap
            best_mid = (a + b) / 2.0
    if best_gap >= TWO_COL_MIN_GAP and best_mid is not None:
        left = [v for v in xs if v < best_mid]
        right = [v for v in xs if v >= best_mid]
        if len(left) >= 2 and len(right) >= 2:
            return best_mid
    return None


def pdf_extract(data: bytes) -> tuple[list[tuple[str, str]], int]:
    """bytes -> (sections [(kind, text)], parse_code). Never raises."""
    try:
        data = bytes(data)
        if not data.startswith(b"%PDF-"):
            return [], CODE_PDF_LAYOUT_ERROR
        if b"%%EOF" not in data[-1024:]:
            return [], CODE_PDF_TRUNCATED
        if re.search(rb"/Encrypt\b", data):
            return [], CODE_PDF_ENCRYPTED
        pages: list[list[tuple[float, float, str]]] = []
        for dict_bytes, body in _iter_streams(data):
            decoded = _decode_stream(dict_bytes, body)
            if decoded is None or b"BT" not in decoded:
                continue
            items = list(_iter_strings_with_pos(decoded))
            if items:
                pages.append(items)
        if not pages:
            return [], CODE_PDF_LAYOUT_ERROR

        # header/footer suppression: identical text in extreme bands
        # on >= 2 pages
        band_texts: dict[str, int] = {}
        for items in pages:
            seen_on_page = set()
            for _x, y, s in items:
                if (y >= PAGE_HEIGHT_DEFAULT * HEADER_BAND or
                        y <= PAGE_HEIGHT_DEFAULT * FOOTER_BAND):
                    key = s.strip()
                    if key and key not in seen_on_page:
                        seen_on_page.add(key)
                        band_texts[key] = band_texts.get(key, 0) + 1
        repeated = {t for t, c in band_texts.items() if c >= 2}

        sections: list[tuple[str, str]] = []
        for items in pages:
            kept = [
                (x, y, s) for x, y, s in items
                if not (
                    s.strip() in repeated
                    and (y >= PAGE_HEIGHT_DEFAULT * HEADER_BAND
                         or y <= PAGE_HEIGHT_DEFAULT * FOOTER_BAND)
                )
            ]
            if not kept:
                continue
            lines = _baselines(kept)
            table_ys = _table_blocks(lines)
            if table_ys:
                # table page: top-down baseline flow, rows tab-joined;
                # (tables + multi-column text never co-occur in this
                # layout model — the grid IS the column structure)
                for y, runs in lines:
                    if y in table_ys:
                        cells = [
                            normalize_text(s).replace("\n", " ")
                            for _x, s in runs
                        ]
                        row = "\t".join(cells).strip("\t")
                        if row:
                            sections.append(("row", row))
                    else:
                        for _x, s in runs:
                            txt = normalize_text(s)
                            if txt:
                                sections.append(("p", txt))
                continue
            split = _cluster_two_columns([x for x, _y, _s in kept])
            if split is None:
                ordered = sorted(kept, key=lambda t: (-round(t[1], 2), round(t[0], 2)))
            else:
                left = sorted(
                    (t for t in kept if t[0] < split),
                    key=lambda t: (-round(t[1], 2), round(t[0], 2)),
                )
                right = sorted(
                    (t for t in kept if t[0] >= split),
                    key=lambda t: (-round(t[1], 2), round(t[0], 2)),
                )
                ordered = left + right
            for _x, _y, s in ordered:
                txt = normalize_text(s)
                if txt:
                    sections.append(("p", txt))
        if not sections:
            return [], CODE_PDF_LAYOUT_ERROR
        return sections, CODE_OK
    except Exception:
        return [], CODE_PDF_LAYOUT_ERROR
