"""Differential tests: fast_parse_dom must produce the EXACT tree of
the stdlib-html.parser reference builder (parse_dom_reference) — the
byte-identity of extracted text rides on this equivalence.

Adjacent data chunks are merged before comparison (chunk boundaries
are an implementation detail; every consumer joins them)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from ragflow_spark.kernels.htmlx import (
    Element,
    fast_parse_dom,
    parse_dom_reference,
)
from ragflow_spark.sources.pages import render_page_html


def canon(el: Element):
    """Iterative flat canonical form (trees can nest 1000s deep on
    adversarial input): pre-order events with explicit open/close
    markers, adjacent data merged."""
    out = []
    buf = []

    def flush():
        if buf:
            out.append("".join(buf))
            buf.clear()

    work = [("open", el)]
    while work:
        kind, node = work.pop()
        if kind == "data":
            buf.append(node)
            continue
        flush()
        if kind == "close":
            out.append(("close", node))
            continue
        out.append(("open", node.tag, tuple(sorted(node.attrs.items()))))
        work.append(("close", node.tag))
        for ch in reversed(node.children):
            work.append(("data", ch) if isinstance(ch, str) else ("open", ch))
    flush()
    return tuple(out)


def both(text: str):
    try:
        ref = canon(parse_dom_reference(text))
        ref_err = None
    except AssertionError as e:
        ref, ref_err = None, str(e)[:40]
    try:
        fast = canon(fast_parse_dom(text))
        fast_err = None
    except AssertionError as e:
        fast, fast_err = None, str(e)[:40]
    assert (ref_err is None) == (fast_err is None), (ref_err, fast_err, text)
    assert ref == fast, text
    return ref


def test_corpus_pages_identical():
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "fish &amp; chips <tag> 'quo' " * 30
    )
    for doc_id in range(120):
        payload = render_page_html(doc_id, base, "en")
        if payload[:5] == b"%PDF-":
            continue
        try:
            text = payload.decode("utf-8")
        except UnicodeDecodeError:
            text = payload.decode("latin-1")
        both(text)


MALFORMED = [
    "",
    "<",
    "a<",
    "<3 is a heart",
    "<p>unclosed <div>nested<p>implicit</div></span>stray",
    "<p attr>bare attr</p>",
    "<p a=1 b='2' c=\"3\" d>vals</p>",
    "<p a=1 a=2>dup</p>",
    '<p a="1" A="2">dup mixed case, first wins</p>',
    '<p A="1" a="2">dup mixed case, upper first</p>',
    '<div CLASS="x">upper attr name</div>',
    '<div class="a" class="b">dup quoted (fast-attr path)</div>',
    '<img src="a" alt=\'b\'/>mixed quotes selfclose',
    '<div a="v1"/ >slash before space</div>',
    '<div a="x<y">lt in value</div>',
    '<div a="x&amp;y" b="plain">entity in fast-attr value</div>',
    '<DiV a="1">mixed-case tag with attrs</dIv>',
    "<p a = '&amp;'>entity in attr</p>",
    "<br/><span/>selfclose</span>",
    "<script>if (a < b && c > d) { x('</scr'+'ipt>'); }</script>after",
    "<script>unterminated...",
    "<SCRIPT>case</SCRIPT>ok",
    "<style a=b>p { color: red } </ style >text",
    "<!-- comment --><!---- weird ----><!>",
    "<!-- unterminated",
    "<!DOCTYPE html><!doctype junk >",
    "<!doctype unterminated",
    "<?php echo '>' ?>tail",
    "<?unterminated",
    "<![CDATA[ raw <b> ]]>after",
    "<![if gte IE 7]>ms<![endif]>",
    "<![cdata unterminated",
    "</>empty</ >spacey</ p>almost",
    "</p attr='>'>tricky",
    "</unmatched>text",
    "<p>&amp; &#x2603; &#9731; &notanentity; &amp incomplete</p>",
    "&#65;&#x41;&#65 &#x41 trailing &",
    "text &am",
    "<p>a</p junk>b",
    "<p/ >odd",
    "<x y='unterminated",
    "<x y=\"open",
    "<p\x00null>weird</p>",
    "<p >spaced</p >",
    "<p><![yikes]]></p>",
    "<div><p>one<li>two<li>three<td>four</div>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
]


@pytest.mark.parametrize("text", MALFORMED)
def test_malformed_identical(text):
    both(text)


_HTMLISH = st.lists(
    st.sampled_from(
        list("<>/!?&;#=' \"abcp123-.:_[]\n\t")
        + [
            "&amp;",
            "<p>",
            "</p>",
            "<!--",
            "-->",
            "<script>",
            "</script>",
            "<![if]>",
            "<![",
            "quo",
            # attribute-shaped tokens: exercise the master-scanner
            # fast-attr branch and its fallback boundary
            'a="1"',
            "A='2'",
            "<div ",
            "/>",
            'class="x"',
        ]
    ),
    max_size=40,
).map("".join)


@given(_HTMLISH)
@settings(max_examples=1500, deadline=None)
def test_fuzz_identical(text):
    both(text)


@given(st.text(max_size=120))
@settings(max_examples=500, deadline=None)
def test_fuzz_arbitrary_text_identical(text):
    both(text)
