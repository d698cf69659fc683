"""Chunking templates: naive / book / paper.

Re-expressed from scratch (the reference's ``rag/app/{naive,book,
paper}.py`` chunkers are NOT in the checkout — SURVEY.md §0.2
[NOT IN CHECKOUT]); semantics follow public RAGFlow docs: split the
extracted sections into chunks under a token budget, `book` respecting
heading hierarchy, `paper` respecting abstract/body/references
structure. Spans are exact: every chunk is ``text[char_start:
char_end]``, spans tile ``[0, len(text))`` without overlap or gaps
(FIXTURES.md §2 invariants), so chunking = computing cut points only.

Token counting is a whitespace + BPE-ish regex count (BASELINE round
instructions): one token per word-ish run, per CJK char, per
punctuation glyph. Deterministic, dependency-free.
"""

from __future__ import annotations

import re

DEFAULT_TOKEN_BUDGET = 256

# word runs | single CJK chars | any other non-space glyph
_TOKEN_RE = re.compile(
    r"[A-Za-z0-9_]+(?:'[a-z]+)?"
    r"|[一-鿿぀-ヿ가-힯]"
    r"|[^\sA-Za-z0-9_]"
)

# sentence-ish boundaries the naive splitter prefers (reference's
# delimiter-driven splitting, agent/component/iteration.py:27 pattern,
# generalized to text): newline, CJK & latin terminals.
_SENT_BOUND_RE = re.compile(r"[\n。；！？!?;.]")


def num_tokens(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


def _cut_points(text: str) -> list[int]:
    """Candidate cut offsets (exclusive end positions), ascending:
    after each sentence boundary run; always len(text) last."""
    cuts = []
    last = -1
    for m in _SENT_BOUND_RE.finditer(text):
        end = m.end()
        # extend over trailing whitespace so the next chunk starts clean
        while end < len(text) and text[end] in " \t":
            end += 1
        if end != last:
            cuts.append(end)
            last = end
    if not cuts or cuts[-1] != len(text):
        cuts.append(len(text))
    return cuts


def _spans_for_segment(
    text: str, seg_start: int, seg_end: int, budget: int
) -> list[tuple[int, int]]:
    """Greedy merge of sentence pieces in text[seg_start:seg_end] into
    spans of <= budget tokens (a single over-budget sentence becomes
    its own chunk — never split inside a sentence unless it alone
    exceeds 2x budget, then hard-split on token boundaries)."""
    seg = text[seg_start:seg_end]
    if not seg:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    tok_count = 0
    prev_cut = 0
    for cut in _cut_points(seg):
        piece = seg[prev_cut:cut]
        pt = num_tokens(piece)
        if tok_count > 0 and tok_count + pt > budget:
            spans.append((start, prev_cut))
            start = prev_cut
            tok_count = 0
        if pt > 2 * budget:
            # pathological single sentence (t10_huge_node): hard split
            if start < prev_cut:
                spans.append((start, prev_cut))
            spans.extend(
                (prev_cut + a, prev_cut + b)
                for a, b in _hard_split(piece, budget)
            )
            start = cut
            tok_count = 0
        else:
            tok_count += pt
        prev_cut = cut
    if start < len(seg):
        spans.append((start, len(seg)))
    return [(seg_start + a, seg_start + b) for a, b in spans if a < b]


def _hard_split(piece: str, budget: int) -> list[tuple[int, int]]:
    spans = []
    start = 0
    count = 0
    last_end = 0
    for m in _TOKEN_RE.finditer(piece):
        count += 1
        last_end = m.end()
        if count >= budget:
            spans.append((start, last_end))
            start = last_end
            count = 0
    if start < len(piece):
        spans.append((start, len(piece)))
    return spans


def chunk_naive(text: str, budget: int = DEFAULT_TOKEN_BUDGET) -> list[tuple[int, int]]:
    """Flat token-budget chunking over the whole text."""
    return _spans_for_segment(text, 0, len(text), budget)


def _section_offsets(text: str, section_texts: list[str]) -> list[tuple[int, int]]:
    """Char offsets of each section inside the joined text.

    The pipeline builds ``text = '\\n'.join(section_texts)`` so offsets
    are arithmetic, no searching."""
    offs = []
    pos = 0
    for s in section_texts:
        offs.append((pos, pos + len(s)))
        pos += len(s) + 1  # the '\n' separator
    return offs


_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
BOOK_SPLIT_LEVEL = 2  # new unit at h1/h2


def chunk_book(
    text: str,
    section_kinds: list[str],
    section_texts: list[str],
    budget: int = DEFAULT_TOKEN_BUDGET,
) -> list[tuple[int, int]]:
    """Hierarchical chunking: a new unit starts at each heading of
    level <= BOOK_SPLIT_LEVEL; units are budget-split internally.
    Covers the full text (leading matter before the first heading is
    its own unit)."""
    offs = _section_offsets(text, section_texts)
    unit_starts = [0]
    for kind, (s, _e) in zip(section_kinds, offs):
        lvl = _HEADING_LEVEL.get(kind)
        if lvl is not None and lvl <= BOOK_SPLIT_LEVEL and s > 0:
            unit_starts.append(s)
    unit_starts = sorted(set(unit_starts))
    spans: list[tuple[int, int]] = []
    for i, us in enumerate(unit_starts):
        ue = unit_starts[i + 1] if i + 1 < len(unit_starts) else len(text)
        spans.extend(_spans_for_segment(text, us, ue, budget))
    return spans


_ABSTRACT_RE = re.compile(r"^\s*abstract\b", re.IGNORECASE)
_REFERENCES_RE = re.compile(r"^\s*(references|bibliography)\b", re.IGNORECASE)


def chunk_paper(
    text: str,
    section_kinds: list[str],
    section_texts: list[str],
    budget: int = DEFAULT_TOKEN_BUDGET,
) -> list[tuple[int, int]]:
    """Paper-aware: abstract is one chunk; references are one chunk;
    body is budget-chunked with heading-aligned unit starts."""
    offs = _section_offsets(text, section_texts)
    abstract_span = None
    refs_start = None
    heading_starts = []
    for kind, txt, (s, e) in zip(section_kinds, section_texts, offs):
        if kind in _HEADING_LEVEL:
            if abstract_span is None and _ABSTRACT_RE.match(txt):
                # abstract = heading + following sections up to next heading
                abstract_span = [s, e]
            elif refs_start is None and _REFERENCES_RE.match(txt):
                refs_start = s
            heading_starts.append(s)
        elif abstract_span is not None and abstract_span[1] + 1 == s and refs_start is None:
            # non-heading section directly continuing the abstract block
            if not heading_starts or heading_starts[-1] <= abstract_span[0]:
                abstract_span[1] = e
    spans: list[tuple[int, int]] = []
    body_start = 0
    body_end = len(text)
    if abstract_span is not None and abstract_span[0] == 0:
        spans.append((0, min(abstract_span[1], len(text))))
        body_start = abstract_span[1] + 1 if abstract_span[1] < len(text) else len(text)
    if refs_start is not None and refs_start > body_start:
        body_end = max(body_start, refs_start - 1)
    # body: unit starts at headings inside (body_start, body_end)
    unit_starts = [body_start] + [
        s for s in heading_starts if body_start < s < body_end
    ]
    unit_starts = sorted(set(unit_starts))
    for i, us in enumerate(unit_starts):
        ue = unit_starts[i + 1] if i + 1 < len(unit_starts) else body_end
        spans.extend(_spans_for_segment(text, us, min(ue, body_end), budget))
    if refs_start is not None and refs_start < len(text):
        spans.append((refs_start, len(text)))
    # close any separator gaps so spans tile [0, len) exactly
    return _tile(spans, len(text))


def _tile(spans: list[tuple[int, int]], n: int) -> list[tuple[int, int]]:
    """Extend each span to touch the next (separators belong to the
    preceding chunk) and clamp to [0, n)."""
    spans = sorted((a, b) for a, b in spans if a < b)
    out = []
    for i, (a, b) in enumerate(spans):
        nxt = spans[i + 1][0] if i + 1 < len(spans) else n
        if i == 0 and a > 0:
            a = 0
        out.append((a, max(b, min(nxt, n)) if b < nxt else b))
    # merge accidental overlaps deterministically
    fixed = []
    for a, b in out:
        if fixed and a < fixed[-1][1]:
            a = fixed[-1][1]
        if a < b:
            fixed.append((a, b))
    if fixed and fixed[-1][1] < n:
        fixed[-1] = (fixed[-1][0], n)
    return fixed


PAPER_MIN_HEADINGS = 1
BOOK_MIN_HEADINGS = 3


def choose_template(section_kinds: list[str], section_texts: list[str]) -> str:
    """Deterministic template choice: 'paper' if an Abstract heading
    exists, 'book' if >= BOOK_MIN_HEADINGS headings, else 'naive'."""
    headings = [
        t for k, t in zip(section_kinds, section_texts) if k in _HEADING_LEVEL
    ]
    if any(_ABSTRACT_RE.match(t) for t in headings):
        return "paper"
    if len(headings) >= BOOK_MIN_HEADINGS:
        return "book"
    return "naive"


def chunk_spans(
    template: str,
    text: str,
    section_kinds: list[str],
    section_texts: list[str],
    budget: int = DEFAULT_TOKEN_BUDGET,
) -> list[tuple[int, int]]:
    if not text:
        return []
    if template == "book":
        spans = chunk_book(text, section_kinds, section_texts, budget)
    elif template == "paper":
        spans = chunk_paper(text, section_kinds, section_texts, budget)
    else:
        spans = chunk_naive(text, budget)
    return _tile(spans, len(text))
