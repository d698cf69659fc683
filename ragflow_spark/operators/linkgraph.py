"""Web link-graph analytics: PageRank over a crawl-scale edge list.

The reference's pipeline stops at per-document processing (agent/
component has no graph operators at all); a web-scale extraction
engine, however, sits next to THE canonical web-scale iterative job —
centrality over the hyperlink graph (Page et al. 1999; the original
MapReduce/Pregel showcase workload). This module implements the power
method as an iterative DataFrame plan in the repo's house style for
iteration (dedup_components / ivf_kmeans_refine): a fixed small number
of rounds, the edge list and every per-round rank table
localCheckpointed so no round re-executes its upstream lineage, and
ids-only shuffles throughout.

Cross-engine determinism: the iteration runs in EXACT INTEGER
arithmetic. With damping d = 0.85 = 85/100 and rank r_k represented as
n_k / (N * 300^k), the update

    r_{k+1} = 0.15/N + 0.85 * sum_in( r_k(src) / outdeg )

with constant outdeg = 3 becomes the integer recurrence

    n_{k+1} = 45 * 300^k + 85 * sum_in( n_k(src) ),    n_0 = 1

(45*300^k / (N*300^{k+1}) = 0.15/N and 85/300 = 0.85/3), so both
engines carry identical BIGINTs and the only float is one final
division of identical integers — no accumulation-order drift, the
same reason bpe/dedup keep integer counts. With K = 3 rounds and the
synthesis graph's bounded in-degree, n_3 < 10^11: far inside BIGINT.

Scale shape (10^11-edge web graph): the edge list is (src, dst) id
pairs only — built here AT THE SCAN from the documents table, in
production read from the link-extraction output — and each round is
one (dst, partial-sum) Exchange at node cardinality plus an ids-only
join, the exact Pregel superstep dataflow. At scale the edge list is
bucketed by src (Iceberg bucket transform) so the rank join never
reshuffles the edges; AQE absorbs hub skew (the same viral-page story
as dedup_incremental). Fixed K here is the test harness's choice;
production iterates the same per-round plan to an L1 convergence
scalar (the dedup_components idiom).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.operators.registry import register, spread, table

PR_ROUNDS = 3
PR_TOPK = 20
# out-link targets: dst_j = (doc_id^2 + c_j) mod N. Quadratic, so the
# in-degree distribution is non-uniform (a bijective map would make
# PageRank stay exactly uniform and the query would test nothing);
# doc_ids are contiguous 0..N-1 in the synthesized corpus, so every
# target is a real node (no mass leak).
PR_LINK_SHIFTS = (1, 17, 29)


def _pagerank_oracle() -> str:
    shifts = ", ".join(f"({c})" for c in PR_LINK_SHIFTS)
    ctes = []
    for k in range(PR_ROUNDS):
        base = 45 * (300**k)
        ctes.append(
            f"""r{k + 1} AS (
      SELECT d.doc_id,
             ({base}::BIGINT + 85 * coalesce(s.w, 0))::BIGINT AS w
      FROM documents d LEFT JOIN (
        SELECT e.dst, sum(r.w) AS w
        FROM edges e JOIN r{k} r ON e.src = r.doc_id
        GROUP BY e.dst
      ) s ON d.doc_id = s.dst
    )"""
        )
    steps = ",\n    ".join(ctes)
    denom = 300**PR_ROUNDS
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT doc_id AS src, (doc_id * doc_id + c) % nn.n AS dst
      FROM documents, nn, (VALUES {shifts}) t(c)
    ),
    r0 AS (SELECT doc_id, 1::BIGINT AS w FROM documents),
    {steps}
    SELECT doc_id, w AS rank_num,
           round(w * 1.0 / (nn.n * {denom}), 4) AS score
    FROM r{PR_ROUNDS}, nn
    ORDER BY w DESC, doc_id ASC LIMIT {PR_TOPK}
    """


@register("link_pagerank", oracle=_pagerank_oracle())
def link_pagerank(spark, sf_dir):
    """PageRank over the synthesized crawl link graph: {PR_ROUNDS}
    power-method rounds in exact integer arithmetic (module docstring
    has the derivation), returning the top-{PR_TOPK} pages by rank
    with their damped scores. Each round is one ids-only join + one
    (dst, sum) Exchange; edges and ranks are localCheckpointed so no
    round re-runs its upstream (the dedup_components invariant)."""
    docs = spread(table(spark, sf_dir, "documents").select("doc_id"))
    n = docs.count()  # 1-row driver scalar (convergence idiom)
    # plain 3-element array, NOT transform(lit_array, lambda): Catalyst
    # doesn't constant-fold higher-order functions and each lambda tree
    # re-evaluates per row (CLAUDE.md invariant)
    dsts = F.array(
        *[
            (F.col("doc_id") * F.col("doc_id") + F.lit(c)) % F.lit(n)
            for c in PR_LINK_SHIFTS
        ]
    )
    edges = (
        docs.select(F.col("doc_id").alias("src"), F.explode(dsts).alias("dst"))
    ).localCheckpoint()
    ranks = docs.select("doc_id", F.lit(1).cast("long").alias("w"))
    for k in range(PR_ROUNDS):
        inbound = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .groupBy("dst")
            .agg(F.sum("w").alias("inw"))
        )
        ranks = (
            docs.join(inbound, docs.doc_id == inbound.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(45 * (300**k)).cast("long")
                    + F.lit(85) * F.coalesce("inw", F.lit(0))
                ).alias("w"),
            )
            .localCheckpoint()
        )
    return ranks.orderBy(F.desc("w"), F.asc("doc_id")).limit(PR_TOPK).select(
        "doc_id",
        F.col("w").alias("rank_num"),
        F.round(F.col("w") * F.lit(1.0) / F.lit(n * 300**PR_ROUNDS), 4).alias(
            "score"
        ),
    )


# --------------------------------------------------------------------------
# link_degree_profile
# --------------------------------------------------------------------------


def _degree_oracle() -> str:
    shifts = ", ".join(f"({c})" for c in PR_LINK_SHIFTS)
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT (doc_id * doc_id + c) % nn.n AS dst
      FROM documents, nn, (VALUES {shifts}) t(c)
    ), indeg AS (
      SELECT d.doc_id, count(e.dst)::BIGINT AS ind
      FROM documents d LEFT JOIN edges e ON d.doc_id = e.dst
      GROUP BY d.doc_id
    )
    SELECT ind AS indegree,
           count(*)::BIGINT AS n_nodes,
           round(count(*) * 1.0 / (SELECT n FROM nn), 4) AS share,
           bit_xor(doc_id)::BIGINT AS nodes_sig
    FROM indeg GROUP BY ind
    """


@register("link_degree_profile", oracle=_degree_oracle())
def link_degree_profile(spark, sf_dir):
    """In-degree distribution of the link graph — the degree-histogram
    audit run next to any centrality job (web graphs are power-law;
    the histogram is how you notice a crawler trap or a link farm
    before PageRank amplifies it). Shares link_pagerank's edge
    synthesis; per in-degree bucket: node count, corpus share, and a
    bit_xor node-set signature — zero-indegree nodes included via the
    left join, so the whole node space is accounted for.

    Scale shape: edges are ids-only from the scan; one (dst, partial
    count) Exchange at node cardinality, one ids-only left join, one
    histogram rollup whose cardinality is bounded by the max
    in-degree (tiny). No payloads anywhere."""
    docs = spread(table(spark, sf_dir, "documents").select("doc_id"))
    n = docs.count()
    dsts = F.array(
        *[
            (F.col("doc_id") * F.col("doc_id") + F.lit(c)) % F.lit(n)
            for c in PR_LINK_SHIFTS
        ]
    )
    edges = docs.select(F.explode(dsts).alias("dst"))
    per_dst = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("cnt"))
    indeg = docs.join(per_dst, docs.doc_id == per_dst.dst, "left").select(
        "doc_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("ind")
    )
    return indeg.groupBy("ind").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.count(F.lit(1)) * F.lit(1.0) / F.lit(n), 4).alias("share"),
        F.expr("bit_xor(doc_id)").alias("nodes_sig"),
    ).select(
        F.col("ind").alias("indegree"), "n_nodes", "share", "nodes_sig"
    )


# --------------------------------------------------------------------------
# anchor_text_stats
# --------------------------------------------------------------------------


def _anchor_oracle() -> str:
    shifts = ", ".join(f"({c})" for c in PR_LINK_SHIFTS)
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    src AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    edges AS (
      SELECT (doc_id * doc_id + c) % nn.n AS dst,
             ws[((doc_id + c) % len(ws))::INT + 1] AS term
      FROM src, nn, (VALUES {shifts}) t(c)
    ), cnt AS (
      SELECT dst, term, count(*) AS c FROM edges GROUP BY dst, term
    ), win AS (
      SELECT dst, term, c,
             row_number() OVER (
               PARTITION BY dst ORDER BY c DESC, term ASC
             ) AS rn
      FROM cnt
    )
    SELECT term AS top_anchor,
           count(*)::BIGINT AS n_pages,
           sum(c)::BIGINT AS n_anchor_hits,
           bit_xor(dst)::BIGINT AS pages_sig
    FROM win WHERE rn = 1 GROUP BY term
    """


@register("anchor_text_stats", oracle=_anchor_oracle())
def anchor_text_stats(spark, sf_dir):
    """Anchor-text aggregation over the link graph — the indexing
    signal the MapReduce paper itself shipped as its worked example
    (Dean & Ghemawat 2004 §2.1 lists it next to inverted indexing;
    Brin & Page 1998 §2.2 is why: anchor words describe the TARGET
    page better than its own text). Each synthesized edge carries one
    anchor term drawn deterministically from the SOURCE document's
    words (word index (src + shift) mod n_words, the same id
    arithmetic as the edge targets); per target page the winning
    anchor is the (count DESC, term ASC) argmax, and the output rolls
    the winners up into a per-term histogram: how many pages each
    term describes, total winning-anchor hits, bit_xor page-set
    signature.

    Scale shape (10^11 edges): the (dst, term) pair stream is ids +
    short tokens only — source TEXT never leaves its partition (the
    anchor word is plucked at the scan) — and the per-pair count gets
    map-side partial aggregation before its Exchange. The per-target
    argmax window partitions by dst (node cardinality, never global),
    and the final histogram is bounded by anchor vocabulary. This is
    the one linkgraph operator whose shuffle carries more than ids —
    by exactly one token per edge, which is the op's irreducible
    payload."""
    from pyspark.sql import Window

    docs = spread(table(spark, sf_dir, "documents").select("doc_id", "text"))
    n = docs.count()  # 1-row driver scalar (pagerank idiom)
    words = F.split(F.col("text"), " ")
    pairs = F.array(
        *[
            F.struct(
                ((F.col("doc_id") * F.col("doc_id") + F.lit(c)) % F.lit(n)).alias(
                    "dst"
                ),
                F.element_at(
                    words,
                    ((F.col("doc_id") + F.lit(c)) % F.size(words)).cast("int")
                    + 1,
                ).alias("term"),
            )
            for c in PR_LINK_SHIFTS
        ]
    )
    edges = docs.select(F.explode(pairs).alias("e")).select("e.dst", "e.term")
    cnt = edges.groupBy("dst", "term").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("term"))
    winners = cnt.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return winners.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("c").alias("n_anchor_hits"),
        F.expr("bit_xor(dst)").alias("pages_sig"),
    ).select(
        F.col("term").alias("top_anchor"), "n_pages", "n_anchor_hits", "pages_sig"
    )
