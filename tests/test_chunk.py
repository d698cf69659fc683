"""Chunking invariants (FIXTURES.md §2): spans tile [0, len) without
overlap; chunk_text == text[start:end]; token budget respected."""

from ragflow_spark.kernels.chunk import (
    choose_template,
    chunk_naive,
    chunk_spans,
    num_tokens,
)
from ragflow_spark.kernels.extract import extract_document
from ragflow_spark.sources.pages import render_page_html


def assert_tiling(spans, n):
    assert spans, "no spans for non-empty text"
    assert spans[0][0] == 0
    assert spans[-1][1] == n
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert a < b and b == c


def test_naive_tiling_and_budget():
    text = ". ".join(f"sentence number {i} with a few words" for i in range(200)) + "."
    spans = chunk_naive(text, budget=64)
    assert_tiling(spans, len(text))
    # every chunk except possibly singletons respects ~budget
    for a, b in spans:
        assert num_tokens(text[a:b]) <= 64 + 16


def test_naive_single_huge_sentence_hard_split():
    text = "word " * 3000  # no sentence boundaries
    spans = chunk_naive(text.strip(), budget=128)
    assert_tiling(spans, len(text.strip()))
    assert len(spans) > 5


def test_empty_text():
    assert chunk_naive("") == []


def test_choose_template():
    assert choose_template(["h1", "p"], ["T", "body"]) == "naive"
    assert choose_template(["h1", "h2", "h2", "h2"], ["T", "A", "B", "C"]) == "book"
    assert (
        choose_template(["h1", "h2", "p"], ["T", "Abstract", "text"]) == "paper"
    )


def test_book_units_align_to_headings():
    kinds = ["h1", "h2", "p", "h2", "p"]
    texts = ["Title", "Ch 1", "body one " * 10, "Ch 2", "body two " * 10]
    text = "\n".join(texts)
    spans = chunk_spans("book", text, kinds, texts, budget=1000)
    assert_tiling(spans, len(text))
    starts = {a for a, _ in spans}
    ch2_off = text.index("Ch 2")
    assert ch2_off in starts  # unit boundary at the h2


def test_paper_abstract_and_references():
    kinds = ["h1", "h2", "p", "h2", "p", "h2", "p"]
    texts = [
        "A Title",
        "Abstract",
        "the abstract body " * 5,
        "1. Intro",
        "intro body " * 50,
        "References",
        "[1] someone et al " * 5,
    ]
    text = "\n".join(texts)
    spans = chunk_spans("paper", text, kinds, texts, budget=40)
    assert_tiling(spans, len(text))
    refs_off = text.index("References")
    assert any(a == refs_off for a, _ in spans)  # refs = own chunk


def test_extract_document_end_to_end_invariants():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 40
    for doc_id in range(20):
        r = extract_document(render_page_html(doc_id, base, "en"))
        if r.parse_status != "ok":
            assert r.parse_code != 0 and r.extracted_text == ""
            continue
        spans = list(zip(r.chunk_starts, r.chunk_ends))
        assert_tiling(spans, len(r.extracted_text))
        for (a, b), tok in zip(spans, r.chunk_tokens):
            assert tok == num_tokens(r.extracted_text[a:b])


def test_determinism():
    base = "one two three four five six seven " * 60
    a = extract_document(render_page_html(3, base, "en"))
    b = extract_document(render_page_html(3, base, "en"))
    assert a == b
