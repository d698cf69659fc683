"""connected_components unit tests: pointer-doubling convergence on
long paths, the cap-exhaustion guard, and a differential check against
a driver-side union-find on random graphs (VERDICT r3 items #5/#8)."""

import random

import pytest


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] + [(int(b), int(a)) for a, b in pairs],
        "src long, dst long",
    )


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_long_path_converges_within_cap(spark):
    """A 40-hop path (diameter 40 >> COMPONENTS_MAX_ITERS=8) must
    still converge thanks to pointer doubling — the r3 verdict's
    silent-mislabel scenario."""
    from ragflow_spark.operators.dedup import (
        COMPONENTS_MAX_ITERS,
        connected_components,
    )

    pairs = [(i, i + 1) for i in range(40)]
    labels = connected_components(
        _edges_df(spark, pairs), max_iters=COMPONENTS_MAX_ITERS
    )
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(41)}


def test_cap_exhaustion_raises(spark):
    """With the cap forced below what the diameter needs, the loop
    must raise instead of returning non-converged labels."""
    from ragflow_spark.operators.dedup import connected_components

    pairs = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(_edges_df(spark, pairs), max_iters=2)


def test_random_graph_matches_union_find(spark):
    """Differential check on a seeded random graph: Spark min-label +
    doubling == large-star/small-star == driver-side union-find."""
    from ragflow_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    nodes = list(range(200))
    pairs = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(160)}
    )
    touched = sorted({n for p in pairs for n in p})
    want = _union_find(pairs, touched)
    edges = _edges_df(spark, pairs)
    got = {
        r["doc_id"]: r["label"]
        for r in connected_components(edges).collect()
    }
    assert got == want
    got_star = {
        r["doc_id"]: r["label"]
        for r in connected_components_star(edges).collect()
    }
    assert got_star == want


def test_star_long_path(spark):
    """large-star/small-star on a 60-hop path with shuffled ids (the
    adversarial layout for min-label propagation)."""
    from ragflow_spark.operators.dedup import connected_components_star

    rng = random.Random(7)
    ids = list(range(100, 161))
    rng.shuffle(ids)
    pairs = list(zip(ids, ids[1:]))
    labels = connected_components_star(_edges_df(spark, pairs))
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 100 for i in range(100, 161)}
