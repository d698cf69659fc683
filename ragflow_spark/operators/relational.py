"""The reference's relational operator core on Spark (SURVEY.md §2.1-2.3).

Each operator cites the reference site it re-expresses; each is pure
DataFrame API (Catalyst-optimizable, no UDFs). Scale notes inline.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window, functions as F

from ragflow_spark.functions.predicates import switch_predicate, switch_route
from ragflow_spark.operators.registry import register, spread, table


@register(
    "union_dedup",
    oracle="""
    SELECT DISTINCT content, src FROM (
      SELECT c_name AS content, 'customer' AS src FROM customer
      UNION ALL
      SELECT s_name AS content, 'supplier' AS src FROM supplier
    )
    """,
)
def union_dedup(spark, sf_dir):
    """F4 `get_input`: concat upstream outputs + drop_duplicates on
    content (reference agent/component/base.py:472-474,507-509), with
    the per-upstream component_id tag (base.py:485,501).

    Scale: dropDuplicates = hash aggregate; at 100 TB prefer
    dropDuplicates over distinct-on-all-columns so the shuffle key is
    just the content hash."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("content"), F.lit("customer").alias("src")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("content"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s).dropDuplicates(["content", "src"])


@register(
    "contains_filter",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE contains(lower(text), 'spark') AND contains(lower(text), 'join')
    """,
)
def contains_filter(spark, sf_dir):
    """S15 TuShare keyword filter: `str.contains(kw, case=False)`
    (reference agent/component/tushare.py:65). Predicate is pushed to
    the parquet scan by Catalyst (no UDF)."""
    d = table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.filter(low.contains("spark") & low.contains("join")).select(
        "doc_id", "n_chars"
    )


@register(
    "switch_predicates",
    oracle="""
    SELECT route, count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM (
      SELECT o_totalprice,
        CASE
          WHEN try_cast(o_totalprice AS DOUBLE) > 200000.0 THEN 'high'
          WHEN lower(o_orderpriority) LIKE '1%' THEN 'urgent'
          WHEN contains(lower(o_orderpriority), 'low') THEN 'low'
          WHEN o_orderstatus = 'F' THEN 'finished'
          ELSE 'default'
        END AS route
      FROM orders
    ) GROUP BY route
    """,
)
def switch_predicates(spark, sf_dir):
    """C3 Switch router (reference agent/component/switch.py:20-129):
    first condition-group that passes wins; predicates are the
    reference's full operator set (contains / start with / = /
    numeric-with-string-fallback >). Compiled to one when/otherwise
    projection — Catalyst constant-folds and pipelines it; routing
    never materializes intermediate tables (unlike the reference's
    per-component DataFrames)."""
    o = table(spark, sf_dir, "orders")
    route = switch_route(
        [
            (switch_predicate(F.col("o_totalprice"), ">", "200000"), "high"),
            (switch_predicate(F.col("o_orderpriority"), "start with", "1"), "urgent"),
            (switch_predicate(F.col("o_orderpriority"), "contains", "low"), "low"),
            (switch_predicate(F.col("o_orderstatus"), "=", "F"), "finished"),
        ],
        default="default",
    )
    return (
        o.withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


@register(
    "top_n_limit",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 4) AS total
    FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 50
    """,
)
def top_n_limit(spark, sf_dir):
    """top_n source limits (reference agent/component/akshare.py:47,
    exesql.py:119-123 fetchmany(top_n)) — ordered-before-limit so the
    result is deterministic (FIXTURES.md §4).

    Scale: orderBy+limit compiles to TakeOrderedAndProject — a
    per-partition top-k then a driver merge of k·P rows, never a full
    sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderdate", "o_orderkey")
        .limit(50)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 4).alias("total"),
        )
    )


@register(
    "split_explode",
    oracle="""
    SELECT p_partkey, i - 1 AS pos, u AS word
    FROM (
      SELECT p_partkey,
             unnest(str_split(p_type, ' ')) AS u,
             generate_subscripts(str_split(p_type, ' '), 1) AS i
      FROM part
    )
    """,
)
def split_explode(spark, sf_dir):
    """C7/C8 Iteration + IterationItem: split parent input by
    delimiter, iterate items with an index cursor (reference
    agent/component/iteration.py:20-44, iterationitem.py:29-52).
    Spark-first: split + posexplode — the whole 'sub-graph per item'
    machinery collapses into one generator expression."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_type"), " ")).alias("pos", "word"),
    )


@register(
    "argmax_count",
    oracle="""
    SELECT o_custkey, priority, n FROM (
      SELECT o_custkey, priority, n,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY n DESC, priority
             ) AS rn
      FROM (
        SELECT o_custkey, o_orderpriority AS priority, count(*) AS n
        FROM orders GROUP BY o_custkey, o_orderpriority
      )
    ) WHERE rn = 1
    """,
)
def argmax_count(spark, sf_dir):
    """C4 Categorize count+argmax (reference agent/component/
    categorize.py:94-106: count occurrences per category, max wins;
    ties resolved deterministically — we pin lexicographic order).

    Scale: two-level aggregate; the window runs on the already-reduced
    (custkey, priority) pairs, not raw rows, so state is tiny."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey", F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("n"), F.asc("priority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "priority", "n")
    )


@register(
    "multirow_fold",
    oracle="""
    SELECT n_name, string_agg(c_name, chr(10) ORDER BY c_name) AS folded,
           count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def multirow_fold(spark, sf_dir):
    """F7 multi-row fold: '\\n'.join(content) when an input has >1 row
    (reference agent/component/base.py:460-467). Sorted within group
    so the fold is deterministic.

    Scale: nation is tiny -> broadcast join, no shuffle on the fact
    side until the final groupBy."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "\n").alias(
                "folded"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "error_as_row",
    oracle="""
    SELECT event_type,
           count(*) AS n_rows,
           sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_error,
           sum(coalesce(k, -1))::BIGINT AS sum_k
    FROM (
      SELECT event_type,
             try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ) GROUP BY event_type
    """,
)
def error_as_row(spark, sf_dir):
    """Error-as-row convention (reference agent/component/baidu.py:70-71:
    failures become content rows, never exceptions): failed casts stay
    in the table as coded rows and are counted, not dropped — the same
    discipline the extraction pipeline applies to parse failures."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_error"),
            F.sum(F.coalesce(F.col("k"), F.lit(-1))).alias("sum_k"),
        )
    )


@register(
    "sql_passthrough",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers,
           round(avg(s_acctbal), 4) AS avg_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name HAVING count(*) >= 1
    """,
)
def sql_passthrough(spark, sf_dir):
    """S2 ExeSQL: SQL-string pass-through execution (reference
    agent/component/exesql.py:109-130 runs extracted SQL statements
    against a live DB). Spark-first: register the tables as temp views
    and hand the statement to spark.sql — Catalyst plans it like any
    DataFrame program; no JDBC hop, no row-limit fetch loop."""
    for t in ("supplier", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_suppliers,
               round(avg(s_acctbal), 4) AS avg_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name HAVING count(*) >= 1
        """
    )


@register(
    "template_interpolation",
    oracle="""
    SELECT n_nationkey,
           'Nation ' || upper(n_name) || ' [' || n_nationkey || '] in region '
             || r_name AS rendered
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def template_interpolation(spark, sf_dir):
    """C10 Template: string interpolation of column refs into a
    template (reference agent/component/template.py:25-147 resolves
    {cpn_id}/{begin@key} refs then regex-substitutes). Spark-first:
    format_string/concat — one codegen'd projection, no Jinja."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rendered = F.format_string(
        "Nation %s [%d] in region %s",
        F.upper(F.col("n_name")),
        F.col("n_nationkey"),
        F.col("r_name"),
    )
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", rendered.alias("rendered"))
    )


@register(
    "rename_projection",
    oracle="""
    SELECT p_partkey AS "Part Key", p_brand AS "Brand Name",
           round(p_retailprice, 4) AS "Retail Price"
    FROM part WHERE p_size > 40
    """,
)
def rename_projection(spark, sf_dir):
    """S17 Jin10 short-key -> long-name rename/projection (reference
    agent/component/jin10.py:93-112 renames columns like 'c' ->
    'Commodity Code'). A pure select+alias — Catalyst prunes unused
    columns at the scan."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_size") > 40).select(
        F.col("p_partkey").alias("Part Key"),
        F.col("p_brand").alias("Brand Name"),
        F.round("p_retailprice", 4).alias("Retail Price"),
    )


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    ORDER BY c_custkey LIMIT 100
    """,
)
def anti_join_customers(spark, sf_dir):
    """Set-difference shape the reference never has (SURVEY.md §2.6:
    'intersect/except unused'): customers with no FINISHED order via LEFT ANTI
    join — the same plan the checkpoint-resume manifest uses
    (plans/checkpoint.py anti-joins splits against completed work).
    Scale: the anti join shuffles only the keys of the smaller
    distinct-keys side. (Filtered to finished orders so the result is
    non-empty at every test SF — every customer has SOME order.)"""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "intersect_active_segments",
    oracle="""
    SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def intersect_active_segments(spark, sf_dir):
    """INTERSECT (the other unused set op, SURVEY.md §2.6): market
    segments that have both a high-balance customer and an ordering
    customer. Compiles to a distinct + semi-join pair."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_mktsegment")
    )
    return rich.intersect(active)


# full-fidelity template render (conditionals/loops/JSON params)

TEMPLATE_FULL = (
    "{% if big %}{{ name }} is long{% else %}{{ name }} is short"
    "{% endif %}|{% for w in words %}[{{ w }}]{% endfor %}|{n} #tag"
)

TEMPLATE_DOCS = 30  # doc_ids rendered
TEMPLATE_BIG_CHARS = 250  # 'big' threshold for the conditional


@register(
    "template_render_full",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN n_chars >= {TEMPLATE_BIG_CHARS}
                THEN 'doc-' || doc_id::VARCHAR || ' is long'
                ELSE 'doc-' || doc_id::VARCHAR || ' is short' END
           || '|' ||
           array_to_string(list_transform(
             list_slice(str_split(
               regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
               1, 3),
             w -> '[' || w || ']'), '')
           || '|' || n_chars::VARCHAR || '  # tag' AS rendered
    FROM documents WHERE doc_id < {TEMPLATE_DOCS}
    """,
)
def template_render_full(spark, sf_dir):
    """C10 Template at full fidelity (reference agent/component/
    template.py:113-147): sandboxed conditional/loop rendering with
    strict undefined + autoescape, JSON-decoded parameter values, the
    `{key}` regex fallback substitution, and `#`-run padding — all in
    kernels/templater.py, applied per row by an Arrow-batched pandas
    UDF. Parameters are assembled JVM-side as a to_json(struct(...))
    column; the oracle precomputes the exact rendered string in SQL.

    Scale shape: pushed-down doc_id filter + map-only render; the
    template string is a literal, never shuffled."""
    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < TEMPLATE_DOCS
    )
    words = F.slice(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""), " "),
        1,
        3,
    )
    params = F.to_json(
        F.struct(
            (F.col("n_chars") >= TEMPLATE_BIG_CHARS).alias("big"),
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("name"),
            words.alias("words"),
            F.col("n_chars").alias("n"),
        )
    )

    @F.pandas_udf("string")
    def render(params_json: pd.Series) -> pd.Series:
        from ragflow_spark.kernels.templater import render_template

        return params_json.map(lambda p: render_template(TEMPLATE_FULL, p))

    return d.select("doc_id", render(params).alias("rendered"))


# ------------------------------------------------- per-group top-k

TOPK_PER_GROUP_K = 3


@register(
    "topk_per_group",
    oracle=f"""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {TOPK_PER_GROUP_K}
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-k rows per group WITHOUT a window — the scale-correct
    two-phase shape: each scan partition first reduces to its own
    per-group top-k (sorted-struct slice inside a hash aggregate, so
    agg state is bounded by partition size and only k rows per
    (partition, group) survive), then a second aggregate merges the
    k-lists per group. A row_number window would shuffle EVERY row
    into |groups| partitions — the classic few-groups straggler; here
    the merge shuffle carries at most k * n_partitions rows per group.
    Rank comes from the final slice position (posexplode), replaying
    the oracle's n_chars DESC, doc_id ASC tie-break via the
    (n_chars, -doc_id) struct ordering."""
    d = spread(table(spark, sf_dir, "documents"))
    k = TOPK_PER_GROUP_K
    item = F.struct(
        F.col("n_chars").alias("nc"),
        (-F.col("doc_id")).alias("nid"),
        F.col("doc_id").alias("doc_id"),
    )
    local = d.groupBy(
        "source", F.spark_partition_id().alias("pid")
    ).agg(
        F.slice(
            F.sort_array(F.collect_list(item), asc=False), 1, k
        ).alias("cand")
    )
    merged = (
        local.select("source", F.explode("cand").alias("c"))
        .groupBy("source")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("c"), asc=False), 1, k
            ).alias("top")
        )
    )
    return merged.select("source", F.posexplode("top")).select(
        "source",
        F.col("col.doc_id").alias("doc_id"),
        F.col("col.nc").alias("n_chars"),
        (F.col("pos") + 1).cast("bigint").alias("rk"),
    )
