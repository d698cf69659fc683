"""JSONL pages source: round-trip byte-exactness and extractor parity."""

from __future__ import annotations


def test_jsonl_round_trip_and_extraction_parity(spark, sf_dir, tmp_path):
    from ragflow_spark.plans.pipeline import assign_splits, extract_pages
    from ragflow_spark.sources.jsonl import read_jsonl_pages, write_jsonl_pages
    from ragflow_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, sf_dir)
    out = str(tmp_path / "dump")
    write_jsonl_pages(pages, out)
    back = read_jsonl_pages(spark, out)

    a = {
        r.url: (bytes(r.html or b""), r.text, r.lang)
        for r in pages.collect()
    }
    b = {
        r.url: (bytes(r.html or b""), r.text, r.lang)
        for r in back.collect()
    }
    assert a == b, "JSONL round trip must be byte-exact on html"

    # and the extractor consumes the JSONL-sourced table identically
    ex = extract_pages(assign_splits(back, 8, 4, None))
    ex0 = extract_pages(assign_splits(pages, 8, 4, None))
    ta = {r.url: r.extracted_text for r in ex.select("url", "extracted_text").collect()}
    tb = {r.url: r.extracted_text for r in ex0.select("url", "extracted_text").collect()}
    assert ta == tb
