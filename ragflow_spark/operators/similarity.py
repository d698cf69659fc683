"""Similarity search over the embeddings table (round brief:
brute-force cosine top-k baseline + LSH-bucketed scale path).

The brute-force path is the correctness baseline (exact top-k); the
sign-LSH path is the 100 TB shape: bucket vectors by hyperplane signs
so the candidate set for a query is one bucket join, not a full scan.
Hyperplanes are md5-derived ±1 vectors so the DuckDB oracle can
reproduce the buckets exactly.

Published basis: sign-random-projection LSH per Charikar (STOC 2002);
bucket-probe query pattern per Datar et al., "Locality-sensitive
hashing scheme based on p-stable distributions" (SoCG 2004).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ragflow_spark.operators.registry import register, spread, table

QUERY_VEC_ID = 0
TOP_K = 10
N_PLANES = 8
DIM = 64


@register(
    "cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS cos
    FROM embeddings e, q
    WHERE e.vec_id != {QUERY_VEC_ID}
    ORDER BY cos DESC, e.vec_id LIMIT {TOP_K}
    """,
)
def cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the 1-row query side, dot
    product via zip_with/aggregate (JVM-side, no UDF), top-k via
    TakeOrderedAndProject. At 100 TB this is the exact-answer scan
    path; `ann_lsh_bucketed` is the sublinear one."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    # spread: the dot products run map-side over the corpus scan — a
    # single-file test scan would serialize them on one core
    joined = spread(e.filter(F.col("vec_id") != QUERY_VEC_ID)).crossJoin(
        F.broadcast(q)
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    cos = dot(F.col("embedding"), F.col("qe")) / (
        norm(F.col("embedding")) * norm(F.col("qe"))
    )
    return (
        joined.select("vec_id", "label", F.round(cos, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _plane_signs(k: int) -> list[float]:
    """Hyperplane k as +-1.0 doubles, precomputed driver-side.

    Semantics are UNCHANGED from the md5 derivation the DuckDB oracle
    uses (sign = first hex char of md5('plane-{k}-{d}') in
    '02468ace'); hashlib.md5 == Spark md5 == DuckDB md5 on UTF-8
    bytes. Precomputing matters: the ±1 vectors are row-independent
    constants, but Catalyst does not constant-fold higher-order
    functions, so deriving them with an in-row transform(... md5 ...)
    expression re-hashed 8 planes x 64 dims = 512 md5 calls PER ROW —
    the dominant cost of the whole bucketing query at any scale."""
    import hashlib

    return [
        1.0
        if hashlib.md5(f"plane-{k}-{d}".encode()).hexdigest()[0] in "02468ace"
        else -1.0
        for d in range(DIM)
    ]


def _plane_sql_literal(k: int) -> str:
    vals = ", ".join(
        "1.0D" if v > 0 else "-1.0D" for v in _plane_signs(k)
    )
    return f"array({vals})"


def _bucket_sql(n_planes: int) -> str:
    """n-bit sign bucket as ONE expression: a single lambda over a 2D
    plane literal. One lambda body = one codegen unit; the earlier
    8-separate-zip_with formulation spent ~6 s of first-use parse +
    janino compile on its 8x larger expression tree."""
    planes2d = "array(" + ", ".join(
        _plane_sql_literal(k) for k in range(n_planes)
    ) + ")"
    return (
        f"array_join(transform({planes2d}, p -> CASE WHEN "
        "aggregate(zip_with(embedding, p, (x, y) -> cast(x as double) * y), "
        "cast(0.0 as double), (acc, v) -> acc + v) >= 0 "
        "THEN '1' ELSE '0' END), '')"
    )


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH planes2 AS (
      SELECT k, list_transform(range({DIM}), d -> CASE WHEN
        strpos('02468ace', substr(md5('plane-' || k || '-' || d), 1, 1)) > 0
        THEN 1.0 ELSE -1.0 END) AS p
      FROM (SELECT unnest(range({N_PLANES})) AS k)
    ), bits AS (
      SELECT e.vec_id, p2.k,
        CASE WHEN list_sum(list_transform(range({DIM}),
             d -> e.embedding[d+1] * p2.p[d+1])) >= 0 THEN '1' ELSE '0' END AS bit
      FROM embeddings e, planes2 p2
    ), buckets AS (
      SELECT vec_id, string_agg(bit, '' ORDER BY k) AS bucket FROM bits
      GROUP BY vec_id
    )
    SELECT bucket, count(*) AS n_vecs FROM buckets
    GROUP BY bucket HAVING count(*) >= 2
    """,
)
def ann_lsh_bucketed(spark, sf_dir):
    """Sign-LSH bucketing for ANN: 8 md5-derived ±1 hyperplanes; the
    bucket is the 8-bit sign pattern of the dot products. Query-time
    ANN = join on bucket (plus neighbor buckets for recall) instead of
    scanning all vectors. Output = bucket histogram (buckets holding
    >= 2 vectors)."""
    e = spread(table(spark, sf_dir, "embeddings"))
    bucket = F.expr(_bucket_sql(N_PLANES))
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("n_vecs") >= 2)
    )


# Query-time ANN uses fewer planes than the histogram: 4 planes -> 16
# buckets, so a 500-vector corpus yields ~30 real candidates per query
# (recall/selectivity trade-off; at 10^9 vectors you'd raise this and
# multi-probe neighbor buckets instead).
QUERY_PLANES = 4


def _bucket_expr(n_planes: int = QUERY_PLANES):
    """The n-bit sign-LSH bucket as one SQL expression over
    `embedding` (shared by indexing and query sides so both hash
    identically)."""
    return F.expr(_bucket_sql(n_planes))


def _duck_bucket_sql(n_planes: int = QUERY_PLANES) -> str:
    bits = []
    for k in range(n_planes):
        bits.append(
            f"CASE WHEN list_sum(list_transform(range({DIM}), d -> "
            f"e.embedding[d+1] * (CASE WHEN strpos('02468ace', "
            f"substr(md5('plane-{k}-' || d), 1, 1)) > 0 THEN 1.0 ELSE -1.0 END)"
            f")) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


@register(
    "ann_query_topk",
    oracle=f"""
    WITH b AS (
      SELECT e.vec_id, e.label, e.embedding, {_duck_bucket_sql()} AS bucket
      FROM embeddings e
    ), q AS (
      SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT b.vec_id, b.label,
           round(list_cosine_similarity(b.embedding::DOUBLE[], q.qe::DOUBLE[]), 4) AS cos
    FROM b, q
    WHERE b.bucket = q.qb AND b.vec_id != {QUERY_VEC_ID}
    ORDER BY cos DESC, b.vec_id LIMIT {TOP_K}
    """,
)
def ann_query_topk(spark, sf_dir):
    """Query-time ANN: hash the query vector to its sign-LSH bucket,
    score ONLY that bucket's candidates with exact cosine, take top-k.
    At 100 TB the index side is bucketed/partitioned by `bucket`, so a
    query touches one partition (1/2^8 of the data here; recall is
    tuned by probing neighbor buckets) instead of scanning every
    vector — the sublinear companion to the exact `cosine_topk`."""
    e = spread(table(spark, sf_dir, "embeddings"))
    b = e.withColumn("bucket", _bucket_expr())
    q = b.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qb")
    )
    cand = b.filter(F.col("vec_id") != QUERY_VEC_ID).join(
        F.broadcast(q), F.col("bucket") == F.col("qb")
    )

    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("qe"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    cos = dot / (norm(F.col("embedding")) * norm(F.col("qe")))
    return (
        cand.select("vec_id", "label", F.round(cos, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# --------------------------------------------------- citation insertion

N_ANSWER_SENTS = 20  # doc/vec ids < this are the "answer sentences"
TK_WEIGHT = 0.7  # token-similarity weight  (reference generate.py:96-101)
VT_WEIGHT = 0.3  # vector-similarity weight (same call site)
CITE_THRESHOLD = 0.5  # below this the sentence gets no citation


@register(
    "cite_insertion",
    oracle=f"""
    WITH side AS (
      SELECT d.doc_id AS id,
             list_distinct(str_split(lower(d.text), ' ')) AS toks,
             e.embedding::DOUBLE[] AS vec
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ), s AS (SELECT * FROM side WHERE id < {N_ANSWER_SENTS}),
    c AS (SELECT * FROM side WHERE id >= {N_ANSWER_SENTS}),
    sims AS (
      SELECT s.id AS sent_id, c.id AS chunk_id,
             len(list_intersect(s.toks, c.toks)) * 1.0 /
               greatest(len(s.toks) + len(c.toks)
                        - len(list_intersect(s.toks, c.toks)), 1) AS tok_sim,
             list_cosine_similarity(s.vec, c.vec) AS vec_sim
      FROM s, c
    ), ranked AS (
      SELECT sent_id, chunk_id, tok_sim, vec_sim,
             {TK_WEIGHT} * tok_sim + {VT_WEIGHT} * vec_sim AS hybrid,
             row_number() OVER (
               PARTITION BY sent_id
               ORDER BY {TK_WEIGHT} * tok_sim + {VT_WEIGHT} * vec_sim DESC,
                        chunk_id
             ) AS rn
      FROM sims
    )
    SELECT sent_id, chunk_id AS cite_id,
           round(tok_sim, 4) AS tok_sim, round(vec_sim, 4) AS vec_sim,
           round(hybrid, 4) AS hybrid
    FROM ranked WHERE rn = 1 AND hybrid >= {CITE_THRESHOLD}
    """,
)
def cite_insertion(spark, sf_dir):
    """Citation-insertion similarity join — the reference's only
    join-like dataflow (agent/component/generate.py:92-125 `set_cite`:
    insert_citations(answer sentences, chunk token lists, chunk
    vectors, tkweight=0.7, vtweight=0.3); the scorer itself lives in
    the absent `rag` package, so the hybrid 0.7*token + 0.3*vector
    similarity join is re-expressed here). Each answer sentence is
    joined against the chunk corpus, scored with hybrid = 0.7*Jaccard
    + 0.3*cosine, and cites its best chunk when the score clears the
    threshold.

    Scale shape: the sentence side is tiny (one answer) -> broadcast;
    the chunk corpus streams map-side through the hybrid scoring; the
    per-sentence argmax shuffles only (sent_id, chunk_id, 3 doubles),
    never vectors or token arrays."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("toks"),
    )
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    side = spread(d.join(e, d.doc_id == e.vec_id)).select(
        "doc_id", "toks", "embedding"
    )
    sents = side.filter(F.col("doc_id") < N_ANSWER_SENTS).select(
        F.col("doc_id").alias("sent_id"),
        F.col("toks").alias("stoks"),
        F.col("embedding").alias("svec"),
    )
    chunks = side.filter(F.col("doc_id") >= N_ANSWER_SENTS).select(
        F.col("doc_id").alias("chunk_id"),
        F.col("toks").alias("ctoks"),
        F.col("embedding").alias("cvec"),
    )
    j = chunks.crossJoin(F.broadcast(sents))

    inter = F.size(F.array_intersect(F.col("stoks"), F.col("ctoks")))
    union = F.size("stoks") + F.size("ctoks") - inter
    tok_sim = inter * F.lit(1.0) / F.greatest(union, F.lit(1))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    vec_sim = dot(F.col("svec"), F.col("cvec")) / (
        norm(F.col("svec")) * norm(F.col("cvec"))
    )
    hybrid = F.lit(TK_WEIGHT) * tok_sim + F.lit(VT_WEIGHT) * vec_sim

    from pyspark.sql import Window

    scored = j.select(
        "sent_id",
        "chunk_id",
        tok_sim.alias("tok_sim"),
        vec_sim.alias("vec_sim"),
        hybrid.alias("hybrid"),
    )
    w = Window.partitionBy("sent_id").orderBy(
        F.desc("hybrid"), F.asc("chunk_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("hybrid") >= CITE_THRESHOLD))
        .select(
            "sent_id",
            F.col("chunk_id").alias("cite_id"),
            F.round("tok_sim", 4).alias("tok_sim"),
            F.round("vec_sim", 4).alias("vec_sim"),
            F.round("hybrid", 4).alias("hybrid"),
        )
    )


# ------------------------------------------- embedding-cosine near-dup

NEARDUP_COS_THRESHOLD = 0.25


@register(
    "neardup_embedding",
    oracle=f"""
    WITH b AS (
      SELECT e.vec_id, e.embedding,
             {_duck_bucket_sql(N_PLANES)} AS bucket
      FROM embeddings e
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           round(list_cosine_similarity(x.embedding::DOUBLE[],
                                        y.embedding::DOUBLE[]), 4) AS cos
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE list_cosine_similarity(x.embedding::DOUBLE[],
                                 y.embedding::DOUBLE[])
          >= {NEARDUP_COS_THRESHOLD}
    """,
)
def neardup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (round brief's fifth
    dedup variant): sign-LSH buckets gate the pair space (same 8-bit
    bucket == 8 agreeing hyperplane signs -> high prior on closeness),
    exact cosine >= {NEARDUP_COS_THRESHOLD} confirms. The join key is
    the 8-char bucket and the pair space is bucket collisions only —
    the same sublinear shape as the text near-dup path, but on
    vectors, so it catches semantic dupes exact/minhash text matching
    misses (translated boilerplate, templated rewrites)."""
    e = spread(table(spark, sf_dir, "embeddings"))
    b = e.select("vec_id", "embedding", F.expr(_bucket_sql(N_PLANES)).alias("bucket"))
    x = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        "bucket",
    )
    y = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = x.join(
        y,
        (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")),
    )

    def dot(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda p: p.cast("double") * p.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    cos = dot(F.col("ea"), F.col("eb")) / (norm(F.col("ea")) * norm(F.col("eb")))
    return (
        pairs.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= NEARDUP_COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))
    )


# ----------------------------------------------------------- IVF ANN

IVF_CENTROID_STRIDE = 50  # vec_id % stride == 7 -> centroid
IVF_CENTROID_PICK = 7
IVF_NPROBE = 2  # query probes its 2 nearest cells


def _duck_cos(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
      WHERE vec_id % {IVF_CENTROID_STRIDE} = {IVF_CENTROID_PICK}
    ), assigned AS (
      SELECT vec_id, label, embedding, cent_id FROM (
        SELECT e.vec_id, e.label, e.embedding, c.cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_duck_cos('e.embedding', 'c.cvec')} DESC, c.cent_id
               ) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    ), qcells AS (
      SELECT cent_id FROM (
        SELECT c.cent_id,
               row_number() OVER (
                 ORDER BY {_duck_cos('q.embedding', 'c.cvec')} DESC, c.cent_id
               ) AS rn
        FROM embeddings q, cents c WHERE q.vec_id = {QUERY_VEC_ID}
      ) WHERE rn <= {IVF_NPROBE}
    )
    SELECT a.vec_id, a.label,
           round({_duck_cos('a.embedding', 'q.embedding')}, 4) AS cos
    FROM assigned a
    JOIN qcells ON a.cent_id = qcells.cent_id,
    (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
    WHERE a.vec_id != {QUERY_VEC_ID}
    ORDER BY cos DESC, a.vec_id LIMIT {TOP_K}
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN (the round brief's second scale path next to
    LSH): a deterministic coarse quantizer — every
    {IVF_CENTROID_STRIDE}th vector is a centroid — partitions the
    corpus into cells by nearest-centroid (cosine); a query probes
    its {IVF_NPROBE} nearest cells and exact-rescores only those
    candidates. At 10^9 vectors the cell assignment is a map-side pass
    against a broadcast centroid table (k centroids << corpus), the
    index is written partitioned by cent_id, and a query touches
    nprobe/k of the data — the classic IVF-flat trade-off, with
    centroids chosen deterministically instead of by k-means so the
    oracle can replay the exact assignment."""
    e = table(spark, sf_dir, "embeddings")
    e_spread = spread(e)
    cents = e.filter(
        F.col("vec_id") % IVF_CENTROID_STRIDE == IVF_CENTROID_PICK
    ).select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec"))

    def dot(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda p: p.cast("double") * p.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    def cosine(a, c):
        return dot(a, c) / (norm(a) * norm(c))

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cent_id")
    )
    assigned = (
        e_spread.crossJoin(F.broadcast(cents))
        .withColumn("ccos", cosine(F.col("embedding"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cent_id")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe")
    )
    qcells = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("qcos", cosine(F.col("qe"), F.col("cvec")))
        .orderBy(F.desc("qcos"), F.asc("cent_id"))
        .limit(IVF_NPROBE)
        .select("cent_id")
    )
    cand = assigned.join(F.broadcast(qcells), "cent_id").filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    cos = cosine(F.col("embedding"), F.col("qe"))
    return (
        cand.crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cos, 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
    )
