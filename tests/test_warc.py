"""WARC source: round-trip + end-to-end extraction parity."""

from __future__ import annotations

import datetime as dt

import pytest

from ragflow_spark.kernels.warcx import build_warc, parse_warc


def _sample_pages(n=5):
    from ragflow_spark.sources.pages import render_page_html, url_for

    return [
        (
            url_for(i),
            dt.datetime(2026, 1, 1, 0, 0, i, tzinfo=dt.timezone.utc),
            render_page_html(i, f"sample document body text number {i} " * 10, "en"),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
@pytest.mark.parametrize("http", [True, False])
def test_roundtrip(gz, http):
    pages = _sample_pages()
    seg = build_warc(pages, per_record_gzip=gz, with_http_headers=http)
    records, skipped = parse_warc(seg)
    assert skipped == 0
    assert [(r.url, r.payload) for r in records] == [
        (u, bytes(p)) for u, _t, p in pages
    ]
    assert records[0].warc_ts == pages[0][1]


def test_non_page_records_skipped_quietly():
    seg = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
        + build_warc(_sample_pages(1), per_record_gzip=False)
    )
    records, skipped = parse_warc(seg)
    assert len(records) == 1 and skipped == 0


def test_garbage_never_raises():
    for data in (b"", b"\x1f\x8b garbage", b"WARC/1.0\r\nbroken", b"x" * 100):
        records, _sk = parse_warc(data)
        assert isinstance(records, list)


def test_warc_to_extraction_end_to_end(spark, tmp_path):
    """Segment files -> read_warc_pages -> the SAME extraction kernels;
    extracted text must equal extracting the payloads directly."""
    from ragflow_spark.kernels.extract import extract_document
    from ragflow_spark.plans.pipeline import assign_splits, extract_pages
    from ragflow_spark.sources.warc import read_warc_pages

    pages = _sample_pages(8)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    (seg_dir / "part-000.warc.gz").write_bytes(build_warc(pages[:4]))
    (seg_dir / "part-001.warc.gz").write_bytes(build_warc(pages[4:]))

    df = read_warc_pages(spark, str(seg_dir))
    assert df.count() == 8
    ex = extract_pages(
        assign_splits(df.select("url", "warc_ts", "html", "text", "lang"), 4, 2, None)
    )
    got = {r["url"]: r["extracted_text"] for r in ex.collect()}
    want = {u: extract_document(p).extracted_text for u, _t, p in pages}
    assert got == want


# ---- property-based hardening ----

from hypothesis import given, settings, strategies as st  # noqa: E402

URLS = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=60,
).map(lambda s: "https://h.example/" + s.replace("\r", "").replace("\n", ""))


@given(
    st.lists(
        st.tuples(URLS, st.binary(max_size=500)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_roundtrip_arbitrary_payloads(items, gz):
    ts = dt.datetime(2026, 2, 3, 4, 5, 6, tzinfo=dt.timezone.utc)
    pages = [(u, ts, p) for u, p in items]
    records, skipped = parse_warc(build_warc(pages, per_record_gzip=gz))
    assert skipped == 0
    assert [(r.url, r.payload) for r in records] == [(u, p) for u, p in items]


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_parse_total_on_garbage(data):
    records, skipped = parse_warc(data)
    assert isinstance(records, list) and skipped >= 0


def test_wet_round_trip_and_map_only_plan(spark, tmp_path):
    """build_wet -> read_wet_documents round-trips text exactly
    (utf-8), skips non-conversion records, and the plan stays
    scan + mapInPandas with no Exchange."""
    import datetime as dt

    from ragflow_spark.kernels.warcx import build_warc, build_wet
    from ragflow_spark.sources.warc import read_wet_documents

    ts = dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc)
    docs = [
        ("https://x/a", ts, "alpha beta gamma"),
        ("https://x/b", ts, "unicode café 中文 text"),
    ]
    seg = tmp_path / "wet"
    seg.mkdir()
    (seg / "s.wet.gz").write_bytes(build_wet(docs))
    # a response-record segment in the same dir must yield no rows
    (seg / "r.wet.gz").write_bytes(
        build_warc([("https://x/c", ts, b"<p>html</p>")])
    )
    df = read_wet_documents(spark, str(seg))
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
    rows = {r.url: r.text for r in df.collect()}
    assert rows == {u: t for u, t, in [(u, t) for u, _ts, t in docs]}
