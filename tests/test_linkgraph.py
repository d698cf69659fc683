"""link_pagerank: hand-checked exact-integer power method."""


def test_pagerank_hand_checked_and_mass_conserving(spark, tmp_path):
    """N=4 graph, dst = (i^2 + c) % 4 for c in (1, 17, 29): every
    node's 3 links collapse onto one target (0,2 -> 1; 1,3 -> 2), so
    ranks are hand-computable: n_3 = 49_950_000 for the two hubs and
    4_050_000 for the unlinked pair, and the exact-integer invariant
    sum(n_k) == N * 300^k (no dangling mass, outdeg constant 3) holds
    at k=3: 108_000_000 == 4 * 300^3. Both engines."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in range(4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    want = [
        (1, 49_950_000, 0.4625),
        (2, 49_950_000, 0.4625),
        (0, 4_050_000, 0.0375),
        (3, 4_050_000, 0.0375),
    ]
    got = [
        tuple(r)
        for r in em.queries()["link_pagerank"](spark, str(sf)).collect()
    ]
    assert got == want
    assert sum(w for _, w, _ in got) == 4 * 300**3  # exact mass
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = [
        tuple(r)
        for r in con.sql(em.oracle_sql()["link_pagerank"])
        .df()
        .itertuples(index=False)
    ]
    assert orc == want


def test_degree_profile_accounts_for_every_edge_and_node(spark, tmp_path):
    """Edge conservation: sum(indegree * n_nodes) == 3N (every one of
    the 3N synthesized edges lands on a real node) and
    sum(n_nodes) == N (zero-indegree nodes included). N=4 graph from
    the pagerank hand test: nodes 1,2 have indegree 6; 0,3 have 0."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in range(4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    rows = sorted(
        tuple(r)
        for r in em.queries()["link_degree_profile"](spark, str(sf)).collect()
    )
    want = [(0, 2, 0.5, 0 ^ 3), (6, 2, 0.5, 1 ^ 2)]
    assert rows == want
    assert sum(ind * n for ind, n, _, _ in rows) == 3 * 4
    assert sum(n for _, n, _, _ in rows) == 4
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = sorted(
        tuple(r)
        for r in con.sql(em.oracle_sql()["link_degree_profile"])
        .df()
        .itertuples(index=False)
    )
    assert orc == want


def test_anchor_winners_hand_checked_with_tiebreak(spark, tmp_path):
    """N=4 graph, each doc's text is 3 unique words ("aI bI cI"), so
    every anchor pluck is hand-computable: shifts (1,17,29) index
    words (i+1)%3, (i+2)%3, (i+2)%3 of source i, and all of source
    i's edges collapse onto one target (pagerank hand test). dst 1
    receives {c0:2, b0:1, a2:1, b2:2} -> count tie 2-2 broken by
    term ASC to "b2"; dst 2 receives {a1:2, c1:1, b3:1, c3:2} ->
    "a1". Both engines."""
    import duckdb

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i}", "en", "s", 8) for i in range(4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))
    want = sorted([("a1", 1, 2, 2), ("b2", 1, 2, 1)])
    got = sorted(
        tuple(r)
        for r in em.queries()["anchor_text_stats"](spark, str(sf)).collect()
    )
    assert got == want
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    orc = sorted(
        tuple(r)
        for r in con.sql(em.oracle_sql()["anchor_text_stats"])
        .df()
        .itertuples(index=False)
    )
    assert orc == want
