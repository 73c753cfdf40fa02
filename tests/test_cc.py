"""Connected components vs a union-find oracle — same ground truth the
reference uses (it calls scipy.sparse.csgraph.connected_components,
/root/reference/blink/biencoder/eval_cluster_linking.py:133-146; scipy
is absent in this sandbox so the oracle is an equivalent union-find)."""

import random

import pytest

from blink_spark.operators.connected_components import CCStats, connected_components


def _oracle_labels(edges, n_nodes):
    """Union-find; returns {node: min-id-in-component} for touched nodes."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edges:
        touched.add(a)
        touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {node: find(node) for node in touched}


@pytest.mark.parametrize("alg", ["alternating", "hashmin"])
@pytest.mark.parametrize("seed,n,m", [(1, 50, 40), (2, 200, 150), (3, 100, 300)])
def test_cc_matches_scipy(spark, alg, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, algorithm=alg).collect()
    }
    exp = _oracle_labels([e for e in edges if e[0] != e[1]], n)
    assert got == exp


@pytest.mark.parametrize("alg", ["alternating", "hashmin"])
def test_cc_long_chain(spark, alg):
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    st = CCStats()
    got = connected_components(df, algorithm=alg, max_iterations=100, stats=st).collect()
    assert len(got) == 61 and all(r["component"] == 0 for r in got)
    if alg == "alternating":
        assert st.iterations <= 12  # O(log n) rounds, not O(n)


def test_cc_stable_under_repartition(spark):
    rng = random.Random(9)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = sorted(
        (r["id"], r["component"])
        for r in connected_components(df.repartition(2)).collect()
    )
    b = sorted(
        (r["id"], r["component"])
        for r in connected_components(df.repartition(17)).collect()
    )
    assert a == b
