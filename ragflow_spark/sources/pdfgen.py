"""Deterministic synthetic PDF builder (fixtures p01-p05, FIXTURES.md §1.2).

Emits minimal but structurally valid PDFs: xref-less readers (like our
kernel) only need header, stream objects with Td/Tj text ops, and the
%%EOF trailer. Flate compression optional and seed-free.
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792  # US Letter, points


def _content_stream(lines: list[tuple[float, float, str]]) -> bytes:
    """lines = [(x, y, text)] absolute positions, emitted as Tm+Tj."""
    ops = [b"BT", b"/F1 11 Tf"]
    for x, y, s in lines:
        esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode("latin-1"))
        ops.append(b"(" + esc.encode("latin-1", "replace") + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def make_pdf(
    pages: list[list[tuple[float, float, str]]],
    compress: bool = True,
    truncate_frac: float | None = None,
    encrypted: bool = False,
) -> bytes:
    """Build a PDF whose page content streams show the given lines."""
    out = bytearray(b"%PDF-1.4\n")
    n_pages = len(pages)
    # object layout: 1=catalog 2=pages, 3..=page objs, then streams
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
    ]
    for i in range(n_pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Contents {3 + n_pages + i} 0 R /Resources << /Font << /F1 "
            f"{3 + 2 * n_pages} 0 R >> >> >>".encode()
        )
    streams = []
    for lines in pages:
        raw = _content_stream(lines)
        if compress:
            body = zlib.compress(raw, 6)
            d = f"<< /Length {len(body)} /Filter /FlateDecode >>".encode()
        else:
            body = raw
            d = f"<< /Length {len(body)} >>".encode()
        streams.append(d + b"\nstream\n" + body + b"\nendstream")
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    for idx, payload in enumerate(
        [*objs, *streams, font], start=1
    ):
        out += f"{idx} 0 obj\n".encode() + payload + b"\nendobj\n"
    trailer_extra = b" /Encrypt 99 0 R" if encrypted else b""
    out += (
        b"trailer\n<< /Size "
        + str(4 + 2 * n_pages).encode()
        + b" /Root 1 0 R"
        + trailer_extra
        + b" >>\nstartxref\n0\n%%EOF\n"
    )
    data = bytes(out)
    if truncate_frac is not None:
        data = data[: int(len(data) * truncate_frac)]
    return data


def single_column_pdf(paragraphs: list[str], header: str = "", footer: str = "") -> bytes:
    """p01-style: flow paragraphs top-down, one column, 2 pages max per
    40 lines; optional repeated header/footer (p03)."""
    pages = []
    lines_per_page = 40
    y_top, dy = 740.0, 16.0
    all_lines: list[str] = []
    for p in paragraphs:
        all_lines.extend(p.split("\n"))
    for start in range(0, len(all_lines), lines_per_page) or [0]:
        chunk = all_lines[start : start + lines_per_page]
        page = []
        if header:
            page.append((72.0, 760.0, header))
        page.extend(
            (72.0, y_top - i * dy, ln) for i, ln in enumerate(chunk) if ln
        )
        if footer:
            page.append((72.0, 30.0, footer))
        pages.append(page)
    if not pages:
        pages = [[(72.0, y_top, "")]]
    return make_pdf(pages)


def table_pdf(
    paragraphs: list[str],
    rows: list[list[str]],
    col_xs: tuple[float, ...] = (72.0, 220.0, 380.0),
) -> bytes:
    """p06-style: flowing paragraphs followed by an aligned table —
    each row's cells share one baseline y at fixed column x positions
    (>= 3 columns so the kernel's table/two-column disambiguation
    classifies it as a table)."""
    y_top, dy = 740.0, 16.0
    page = []
    i = 0
    for p in paragraphs:
        for ln in p.split("\n"):
            if ln:
                page.append((72.0, y_top - i * dy, ln))
                i += 1
    i += 1  # blank gap before the table
    for row in rows:
        y = y_top - i * dy
        for x, cell in zip(col_xs, row):
            page.append((x, y, cell))
        i += 1
    return make_pdf([page])


def two_column_pdf(left_lines: list[str], right_lines: list[str]) -> bytes:
    """p02-style: left column x=60, right column x=320."""
    y_top, dy = 740.0, 16.0
    page = [(60.0, y_top - i * dy, ln) for i, ln in enumerate(left_lines)]
    page += [(320.0, y_top - i * dy, ln) for i, ln in enumerate(right_lines)]
    return make_pdf([page])
