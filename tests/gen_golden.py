#!/usr/bin/env python3
"""Generate (or regenerate) the pinned golden fixtures (FIXTURES.md §2).

Usage: python tests/gen_golden.py

Writes tests/fixtures/golden_sf0001.json.gz: for every url of the
deterministic sf0.001 pages table — full extracted_text (byte-exact
pin), parse_status/code, n_sections, and every chunk span. Committed
once at FIXTURE_VERSION; regeneration requires bumping FIXTURE_VERSION
in ragflow_spark/__init__.py and reviewing the diff (FIXTURES.md §5.5).
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "fixtures", "golden_sf0001.json.gz")


def build_golden(spark) -> dict:
    from ragflow_spark import FIXTURE_VERSION
    from ragflow_spark.plans.pipeline import assign_splits, extract_pages
    from ragflow_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, SF_DIR)
    staged = assign_splits(pages, n_splits=16, salt_factor=4, hot_hosts=None)
    ex = extract_pages(staged)
    rows = ex.select(
        "url",
        "content_type",
        "extracted_text",
        "parse_status",
        "parse_code",
        "n_sections",
        "chunks",
    ).collect()
    docs = {}
    for r in sorted(rows, key=lambda r: r["url"]):
        docs[r["url"]] = {
            "content_type": r["content_type"],
            "extracted_text": r["extracted_text"],
            "parse_status": r["parse_status"],
            "parse_code": r["parse_code"],
            "n_sections": r["n_sections"],
            "chunks": [
                [c["chunk_id"], c["template"], c["char_start"], c["char_end"],
                 c["token_count"]]
                for c in (r["chunks"] or [])
            ],
        }
    return {"fixture_version": FIXTURE_VERSION, "sf_dir": SF_DIR, "docs": docs}


def main() -> None:
    from ragflow_spark.session import get_spark

    spark = get_spark("gen-golden", cores=8, shuffle_partitions=8)
    golden = build_golden(spark)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(golden, f, ensure_ascii=False, sort_keys=True)
    print(f"wrote {OUT}: {len(golden['docs'])} urls, "
          f"version {golden['fixture_version']}")
    spark.stop()


if __name__ == "__main__":
    main()
