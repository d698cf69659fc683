"""Semantics of the corpus-cleanup operators (operators/corpus.py):
keep-first span dedup, Gopher repetition signals (modal 2-gram with
lexicographic tie-break), PII redaction. Cross-engine value equality
is covered by test_oracle_parity.py; these pin the SEMANTICS on
crafted corpora where the expected answer is hand-checkable, plus a
seeded randomized differential against a pure-Python reference for
the run-length 2-gram scan."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ragflow_spark.operators as ops
from ragflow_spark.operators.corpus import EMAIL_RE, IP_RE, PHONE_RE


def _write_documents(tmp_path, texts, sources=None):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": sources or ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_segment_dedup_keep_first(spark, tmp_path):
    # 'a b c' occurs in doc 0 (pos 0) and doc 1 (pos 0): keeper is the
    # min (doc_id, pos) occurrence, so doc 1 loses its copy; doc 2 is
    # untouched.
    d = _write_documents(
        tmp_path, ["a b c d e f", "a b c x y z", "q r s"]
    )
    row = ops.QUERIES["segment_dedup"](spark, d).collect()[0]
    assert row.n_docs == 3
    assert row.total_segs == 5  # 2 + 2 + 1
    assert row.removed_segs == 1
    assert row.empty_docs == 0
    # doc 1 keeps only 'x y z' -> kept chars = 11 + 5 + 5
    assert row.kept_chars == len("a b c d e f") + len("x y z") + len("q r s")


def test_segment_dedup_fully_removed_doc(spark, tmp_path):
    # doc 1 is exactly the duplicated span: it empties entirely but
    # must still be counted (the regroup cannot drop it).
    d = _write_documents(tmp_path, ["a b c d", "a b c", "a b c z z z"])
    row = ops.QUERIES["segment_dedup"](spark, d).collect()[0]
    assert row.n_docs == 3
    # segs: doc0 ['a b c','d'], doc1 ['a b c'], doc2 ['a b c','z z z']
    assert row.total_segs == 5
    assert row.removed_segs == 2  # docs 1 and 2 lose 'a b c'
    assert row.empty_docs == 1


def test_repetition_modal_2gram_and_tiebreak(spark, tmp_path):
    # doc 0: 'x y' occurs twice (modal); doc 1: every 2-gram unique ->
    # counts tie at 1, lexicographically smallest gram wins; doc 2:
    # single word -> no 2-gram, top2 = 0.
    d = _write_documents(tmp_path, ["x y x y", "b a c", "solo"])
    rows = ops.QUERIES["repetition_signals"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 3
    # doc0: best run 2, gram 'x y' (3 chars), text len 7 -> 6/7
    # doc1: tie -> 'a c' (3 chars), len 5 -> 3/5
    # doc2: 0
    exp = round((round(2 * 3 / 7, 4) + round(3 / 5, 4) + 0.0) / 3, 4)
    assert r.avg_top2_frac == pytest.approx(exp, abs=1e-4)
    assert r.flagged_repetitive == 2  # 0.8571 and 0.6 both > 0.2


def _py_top2(text):
    ws = text.split(" ")
    if len(ws) < 2:
        return 0.0
    grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    cnt = Counter(grams)
    best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return round(best[1] * len(best[0]) / len(text), 4)


def test_repetition_scan_matches_python_reference(spark, tmp_path):
    rng = np.random.default_rng(42)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(60)
    ]
    d = _write_documents(tmp_path, texts)
    r = ops.QUERIES["repetition_signals"](spark, d).collect()[0]
    exp_avg = round(sum(_py_top2(t) for t in texts) / len(texts), 4)
    assert r.avg_top2_frac == pytest.approx(exp_avg, abs=1e-4)
    exp_flag = sum(_py_top2(t) > 0.20 for t in texts)
    assert r.flagged_repetitive == exp_flag


def test_pii_redaction_counts_and_placeholders(spark, tmp_path):
    # doc_id 0 divides 5, 7 and 11: all three injections fire.
    d = _write_documents(tmp_path, ["hello world"] * 12)
    r = ops.QUERIES["pii_redact_stats"](spark, d).collect()[0]
    ids = range(12)
    exp_emails = sum(1 for i in ids if i % 5 == 0)
    exp_phones = sum(1 for i in ids if i % 7 == 0)
    exp_ips = sum(1 for i in ids if i % 11 == 0)
    assert (r.emails, r.phones, r.ips) == (exp_emails, exp_phones, exp_ips)
    # redaction shrinks the corpus (every injected PII string is
    # longer than its placeholder)
    assert r.chars_after < r.chars_before


def test_pii_patterns_python_crosscheck():
    """The three regexes, run by Python's engine, hit the injected
    forms exactly once each and nothing inside the word-soup base."""
    t = (
        "plain words only contact eng35@crawl-example.org"
        " call +1-555-0042 from 10.35.0.35"
    )
    assert len(re.findall(EMAIL_RE, t)) == 1
    assert len(re.findall(PHONE_RE, t)) == 1
    assert len(re.findall(IP_RE, t)) == 1
    red = re.sub(
        IP_RE, "<IP>", re.sub(PHONE_RE, "<PHONE>", re.sub(EMAIL_RE, "<EMAIL>", t))
    )
    assert red == "plain words only contact <EMAIL> call <PHONE> from <IP>"


def test_pack_sequences_shard_local_form(spark, sf_dir):
    """The production packing plan documented in trainprep.py: run the
    IDENTICAL cum-sum window per (source, shard) instead of per source
    — no global per-source sort, each shard pads its own tail.
    Invariants vs the per-source form: doc and token totals are
    unchanged, every shard needs ceil(shard_tokens/L) sequences, and
    the summed shard sequence count is >= the per-source count (shard
    tails add padding, never save it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ragflow_spark.operators.registry import QUERIES, table
    from ragflow_spark.operators.trainprep import PACK_SEQ_LEN as L

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("nt"),
        F.spark_partition_id().alias("shard"),
    )
    per_shard = toks.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("tokens"),
        F.floor((F.sum("nt") + F.lit(L - 1)) / L).alias("n_seq"),
    )
    sharded = (
        per_shard.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("tokens").alias("total_tokens"),
            F.sum("n_seq").alias("n_sequences"),
        )
        .collect()
    )
    global_form = {
        r["source"]: r for r in QUERIES["pack_sequences"](spark, sf_dir).collect()
    }
    assert len(sharded) == len(global_form)
    for r in sharded:
        g = global_form[r["source"]]
        assert r["n_docs"] == g["n_docs"]
        assert r["total_tokens"] == g["total_tokens"]
        # shard-local packing can only ADD ragged-tail padding
        assert r["n_sequences"] >= g["n_sequences"]


# ----------------------------------------------------- count-min sketch


def test_cms_overestimates_within_bound(spark, sf_dir):
    """Differential check of the bounded-state heavy-hitter twin: for
    every gram the exact operator surfaces, the CMS estimate must be
    >= the true count (one-sided guarantee holds ALWAYS) and within
    the paper's e/w * N overestimate bound (probabilistic over the
    hash draw, deterministic here since md5 + fixed data)."""
    from ragflow_spark.operators.corpus import bigram_stream
    from ragflow_spark.operators.countmin import (
        build_cms,
        cms_error_bound,
        cms_estimate,
    )
    from ragflow_spark.operators.registry import spread, table

    grams = bigram_stream(spread(table(spark, sf_dir, "documents")))
    grid = build_cms(grams, "gram")
    exact = {
        r["gram"]: r["n"]
        for r in grams.groupBy("gram").count().withColumnRenamed("count", "n").collect()
    }
    assert int(grid[0].sum()) == sum(exact.values())  # every row sees N
    bound = cms_error_bound(grid)
    worst = 0
    for g, n in exact.items():
        est = cms_estimate(grid, g)
        assert est >= n, (g, est, n)
        worst = max(worst, est - n)
    assert worst <= bound, (worst, bound)


def test_cms_is_linear_and_partition_invariant(spark, sf_dir):
    """sketch(A) + sketch(B) == sketch(A ∪ B) (the property that makes
    the per-partition merge correct), and the merged grid must not
    depend on input partitioning."""
    from ragflow_spark.operators.corpus import bigram_stream
    from ragflow_spark.operators.countmin import build_cms
    from ragflow_spark.operators.registry import spread, table

    docs = spread(table(spark, sf_dir, "documents"))
    grams = bigram_stream(docs)
    full = build_cms(grams, "gram")
    even = build_cms(bigram_stream(docs.filter("doc_id % 2 = 0")), "gram")
    odd = build_cms(bigram_stream(docs.filter("doc_id % 2 = 1")), "gram")
    assert (even + odd == full).all()
    repartitioned = build_cms(grams.repartition(7), "gram")
    assert (repartitioned == full).all()


# ------------------------------------------------------ BPE induction


def test_bpe_merge_semantics_and_early_stop(spark, tmp_path):
    """Hand-checkable BPE: corpus 'aa aa aa b' has exactly one
    possible merge ('a a', weight 3 — left-to-right non-overlapping),
    after which no pairs remain: the operator must emit one row and
    stop, on BOTH engines."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(0, "aa aa aa b", "en", "src0", 10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    got = sorted(
        tuple(r) for r in em.queries()["bpe_merge_induction"](spark, str(sf)).collect()
    )
    assert got == [(1, "a a", 3)]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = sorted(
        tuple(r)
        for r in con.sql(em.oracle_sql()["bpe_merge_induction"]).df().itertuples(index=False)
    )
    assert orc == [(1, "a a", 3)]


def test_bpe_encode_stats_hand_checked(spark, tmp_path):
    """Hand-checkable encode: vocab {aaab x4, ab x1} induces merges
    'a a'(8) -> 'a b'(5) -> 'aa ab'(4); encoding 'aaab' takes 1 token,
    'ab' takes 1, so src0 ('aaab aaab aaab') compresses 12 chars -> 3
    tokens and src1 ('ab aaab') 6 chars -> 2 tokens, on BOTH engines."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [
            (0, "aaab aaab aaab", "en", "src0", 14),
            (1, "ab aaab", "en", "src1", 7),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    want = [
        ("src0", 1, 12, 3, 4.0),
        ("src1", 1, 6, 2, 3.0),
    ]
    got = sorted(
        tuple(r)
        for r in em.queries()["bpe_encode_stats"](spark, str(sf)).collect()
    )
    assert got == want
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = sorted(
        tuple(r)
        for r in con.sql(em.oracle_sql()["bpe_encode_stats"])
        .df()
        .itertuples(index=False)
    )
    assert orc == want


def test_snapshot_retention_reads_the_real_chain(spark, sf_dir, tmp_path, monkeypatch):
    """The retention plan must derive from the MATERIALIZED snap-*.json
    files, not re-synthesize the chain: deleting one snapshot file
    from the cached run drops exactly that row from the plan (and the
    bit_xor split signatures match the wave chunking)."""
    import os

    import __spark_entry__ as em

    monkeypatch.setenv("SPARK_GRAFT_SNAPSTORE_DIR", str(tmp_path / "snapstore"))
    q = em.queries()["snapshot_retention_plan"]
    rows = {r.snapshot_id: r for r in q(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5, 6]
    assert rows[1].splits_sig == 0 ^ 1 ^ 2
    assert rows[6].n_splits_added == 1  # ragged 16th split
    assert [rows[i].expired for i in sorted(rows)] == [
        True, True, True, False, False, False,
    ]

    from ragflow_spark.sources.snapstore import cache_path

    victim = os.path.join(cache_path(sf_dir), "snapshots", "snap-000004.json")
    os.remove(victim)
    after = {r.snapshot_id for r in q(spark, sf_dir).collect()}
    assert after == {1, 2, 3, 5, 6}


def test_bpe_merge_cannot_cross_merged_symbol_boundary(spark, tmp_path):
    """Round-5 review regression: with merges ('a a', 'a b') learned,
    word 'aab' must encode as [aa, b] — merge 2 must NOT anchor on the
    character suffix of the merged symbol 'aa' (the trailing-separator
    encoding did: 'aa|b|' contains 'a|b|'). Under the wrapped encoding
    the corpus 'aa aa aa aab ab' therefore induces a THIRD merge
    ('aa b') and encodes to exactly 5 tokens / 11 chars, on BOTH
    engines."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(0, "aa aa aa aab ab", "en", "src0", 15)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )

    want_merges = [(1, "a a", 4), (2, "a b", 1), (3, "aa b", 1)]
    got = sorted(
        tuple(r)
        for r in em.queries()["bpe_merge_induction"](spark, str(sf)).collect()
    )
    assert got == want_merges
    orc = sorted(
        tuple(r)
        for r in con.sql(em.oracle_sql()["bpe_merge_induction"])
        .df()
        .itertuples(index=False)
    )
    assert orc == want_merges

    want_enc = [("src0", 1, 11, 5, 2.2)]
    got_e = [
        tuple(r)
        for r in em.queries()["bpe_encode_stats"](spark, str(sf)).collect()
    ]
    assert got_e == want_enc
    orc_e = [
        tuple(r)
        for r in con.sql(em.oracle_sql()["bpe_encode_stats"])
        .df()
        .itertuples(index=False)
    ]
    assert orc_e == want_enc


def test_crawl_diff_degenerate_sources_match_cross_engine(spark, tmp_path):
    """The review-added guards for degenerate sources, unreachable at
    the test scale factors: a source whose every page vanished from
    the current crawl (n_curr = 0 -> churn_ratio NULL on BOTH engines,
    not inf) and a source that only exists in the current crawl
    (no both-present rows -> unchanged = 0, not NULL). doc_ids chosen
    against the drop moduli: 5/28/51 are all == 5 (mod 23) and none
    == 3 (mod 19); 3/22/41 the reverse."""
    import duckdb
    import math

    import __spark_entry__ as em

    rows = [
        # 'gone': prev-only (dropped from curr by doc_id % 23 == 5)
        *[(i, f"t{i} x", "en", "gone", 4) for i in (5, 28, 51)],
        # 'newsrc': curr-only (dropped from prev by doc_id % 19 == 3)
        *[(i, f"t{i} y", "en", "newsrc", 4) for i in (3, 22, 41)],
        # a normal source so the query has ordinary rows too
        *[(i, f"t{i} z", "en", "both", 4) for i in (0, 1, 2)],
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))

    got = {
        r["source"]: r.asDict()
        for r in em.queries()["crawl_snapshot_diff"](spark, str(sf)).collect()
    }
    assert got["gone"]["n_curr"] == 0 and got["gone"]["removed"] == 3
    assert got["gone"]["unchanged"] == 0 and got["gone"]["changed"] == 0
    assert got["gone"]["churn_ratio"] is None  # NOT inf, NOT NaN
    assert got["newsrc"]["n_prev"] == 0 and got["newsrc"]["added"] == 3
    assert got["newsrc"]["unchanged"] == 0  # count(when), not NULL sum

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = {
        r["source"]: dict(r)
        for _, r in con.sql(em.oracle_sql()["crawl_snapshot_diff"])
        .df()
        .iterrows()
    }
    for src_name in ("gone", "newsrc", "both"):
        g, o = got[src_name], orc[src_name]
        for k in ("n_prev", "n_curr", "added", "removed", "changed", "unchanged"):
            assert int(g[k]) == int(o[k]), (src_name, k, g[k], o[k])
        gc, oc = g["churn_ratio"], o["churn_ratio"]
        if gc is None:
            assert oc is None or (isinstance(oc, float) and math.isnan(oc))
        else:
            assert abs(gc - oc) < 1e-9, (src_name, gc, oc)


def test_hll_registers_match_python_reference(spark, tmp_path):
    """Register-exact differential for hll_cardinality: a pure-Python
    HyperLogLog (md5 -> idx/rho -> max per register -> Flajolet raw
    estimate with the Heule small-range branch) over a crafted corpus
    must reproduce the Spark pipeline's estimate to the 4-decimal
    rounding on every source, and the exact twin must equal the true
    distinct-text count — including a single-text source (cardinality
    1, all-but-one register empty) and a heavy-dup source whose
    distinct count is far below its row count."""
    import hashlib
    import math

    import __spark_entry__ as em
    from ragflow_spark.operators.hll import HLL_M, _RAW_NUMER, _SMALL_RANGE

    texts, sources = [], []
    # 'wide': 120 distinct texts; 'dup': 90 rows over 6 distinct
    # texts; 'one': 40 copies of a single text.
    for i in range(120):
        texts.append(f"wide text {i} alpha")
        sources.append("wide")
    for i in range(90):
        texts.append(f"dup text {i % 6} beta")
        sources.append("dup")
    for _ in range(40):
        texts.append("the one constant page")
        sources.append("one")
    d = _write_documents(tmp_path, texts, sources=sources)

    got = {
        r["source"]: r.asDict()
        for r in em.queries()["hll_cardinality"](spark, d).collect()
    }

    expected_exact = {"wide": 120, "dup": 6, "one": 1}
    for src, rows in (("wide", 120), ("dup", 6), ("one", 1)):
        assert got[src]["n_exact"] == expected_exact[src]

    # pure-Python reference sketch per source
    regs = {s: [0] * HLL_M for s in expected_exact}
    seen = {s: set() for s in expected_exact}
    for t, s in zip(texts, sources):
        if t in seen[s]:
            continue
        seen[s].add(t)
        h = hashlib.md5(t.encode()).hexdigest()
        idx = int(h[:2], 16) % HLL_M
        w60 = int(h[2:17], 16)
        rho = 61 if w60 == 0 else 61 - w60.bit_length()
        regs[s][idx] = max(regs[s][idx], rho)
    for src in expected_exact:
        denom = sum(1 << (61 - m) for m in regs[src])
        e_raw = _RAW_NUMER / float(denom)
        v = sum(1 for m in regs[src] if m == 0)
        est = (
            HLL_M * math.log(HLL_M / v)
            if (e_raw <= _SMALL_RANGE and v > 0)
            else e_raw
        )
        assert got[src]["v_empty"] == v
        assert got[src]["max_rho"] == max(regs[src])
        assert got[src]["hll_estimate"] == pytest.approx(
            round(est, 4), abs=1e-4
        )
        assert got[src]["rel_err"] == pytest.approx(
            round(abs(est - expected_exact[src]) / expected_exact[src], 4),
            abs=1e-4,
        )
    # the crafted corpus must exercise the small-range branch at least
    # once (the 'one' source cannot avoid it: 63 empty registers)
    assert got["one"]["v_empty"] == HLL_M - 1


def test_fetch_schedule_politeness_hand_checked(spark, tmp_path):
    """doc_ids 0..9: 0,1,2 land on big.example.com (Disallow /doc-3
    misses them), 3..9 each open a siteNN host whose single url IS its
    own Disallow prefix (site03's /doc-3 etc.) — so the whole schedule
    is big.example.com's 3-url queue at Crawl-delay 1: slots follow
    md5-priority order (recomputed here with hashlib), makespan
    (n-1)*delay = 2, and the signature binds doc_id to slot."""
    import hashlib

    import __spark_entry__ as em

    d = _write_documents(tmp_path, [f"t{i} x" for i in range(10)])
    rows = em.queries()["fetch_schedule"](spark, d).collect()
    assert len(rows) == 1  # every siteNN url is self-disallowed
    got = rows[0].asDict()
    assert got["host"] == "big.example.com"
    assert got["crawl_delay_s"] == 1
    assert got["n_scheduled"] == 3
    assert got["makespan_s"] == 2

    prio = {
        i: int(
            hashlib.md5(
                f"https://big.example.com/doc-{i}".encode()
            ).hexdigest()[:8],
            16,
        )
        for i in (0, 1, 2)
    }
    order = sorted(prio, key=lambda i: (-prio[i], i))
    assert got["first_doc"] == order[0]
    sig = 0
    for slot, i in enumerate(order):
        sig ^= i * (slot + 1)
    assert got["sched_sig"] == sig
