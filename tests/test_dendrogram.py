"""G8 dendrogram purity: hand-derivable fixtures + a brute-force
oracle (naive cluster-pair HAC + explicit LCA purity) at 1e-9, per
the reference's higra flow (dendrogram_purity.py:28-35, 295-311)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from blink_spark.operators.dendrogram import (
    dendrogram_purity,
    dendrogram_purity_py,
)


def _brute_purity(edges, labels, linkage):
    """Naive O(n^3) graph-HAC with the same (dist, min-rep, max-rep)
    tie-break, then purity via explicit LCA over all same-class
    pairs."""
    clusters = [{v} for v in sorted(labels)]

    def dist(A, B):
        ds = [
            float(d)
            for a, b, d in edges
            if (a in A and b in B) or (b in A and a in B)
        ]
        if not ds:
            return None
        if linkage == "single":
            return min(ds)
        if linkage == "complete":
            return max(ds)
        return sum(ds) / len(ds)

    merges = []
    while len(clusters) > 1:
        best = None
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = dist(clusters[i], clusters[j])
                if d is None:
                    continue
                ra, rb = min(clusters[i]), min(clusters[j])
                key = (d, min(ra, rb), max(ra, rb))
                if best is None or key < best[0]:
                    best = (key, i, j)
        if best is None:  # stitch components, smallest reps first
            order = sorted(range(len(clusters)), key=lambda i: min(clusters[i]))
            i, j = order[0], order[1]
        else:
            _, i, j = best
        a, b = clusters[i], clusters[j]
        merges.append((set(a), set(b)))
        merged = a | b
        clusters = [
            c for k, c in enumerate(clusters) if k not in (i, j)
        ] + [merged]
    num, den = 0.0, 0
    leaves = sorted(labels)
    for xi, x in enumerate(leaves):
        for y in leaves[xi + 1 :]:
            if labels[x] != labels[y]:
                continue
            for a, b in merges:  # first merge uniting x and y = LCA
                if (x in a and y in b) or (x in b and y in a):
                    lca = a | b
                    same = sum(1 for v in lca if labels[v] == labels[x])
                    num += same / len(lca)
                    den += 1
                    break
    return (num / den) if den else 1.0


def test_purity_hand_example_pure():
    edges = [(1, 2, 0.1), (3, 4, 0.2), (2, 3, 0.9)]
    labels = {1: "X", 2: "X", 3: "Y", 4: "Y"}
    assert dendrogram_purity_py(edges, labels, "single") == pytest.approx(1.0)


def test_purity_hand_example_mixed():
    # interleaved classes: both same-class pairs have the ROOT as LCA
    edges = [(1, 2, 0.1), (2, 3, 0.5), (3, 4, 0.2)]
    labels = {1: "X", 2: "Y", 3: "X", 4: "Y"}
    assert dendrogram_purity_py(edges, labels, "single") == pytest.approx(0.5)


def test_purity_disconnected_forest_stitch():
    # two components, no connecting edge: same-class pairs within each
    # component are pure; the cross pair (1,3 both X) meets at the
    # infinite-distance stitch over 4 leaves -> purity 2/4
    edges = [(1, 2, 0.1), (3, 4, 0.1)]
    labels = {1: "X", 2: "Y", 3: "X", 4: "Y"}
    got = dendrogram_purity_py(edges, labels, "average")
    assert got == pytest.approx((0.5) / 1.0) or got == pytest.approx(0.5)


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
@pytest.mark.parametrize("seed", [3, 17])
def test_purity_matches_brute_force(linkage, seed):
    rng = random.Random(seed)
    n = 14
    labels = {i: i % 3 for i in range(n)}
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.45:
                edges.append((i, j, round(rng.random(), 3)))
    got = dendrogram_purity_py(edges, labels, linkage)
    exp = _brute_purity(edges, labels, linkage)
    assert got == pytest.approx(exp, abs=1e-9), (linkage, got, exp)


def test_purity_separable_is_one():
    rng = random.Random(5)
    edges, labels = [], {}
    for c in range(4):
        members = list(range(c * 10, c * 10 + 10))
        for v in members:
            labels[v] = c
        for i in members:
            for j in members:
                if i < j:
                    edges.append((i, j, round(rng.uniform(0.0, 0.3), 3)))
    # weak inter-class edges, all farther than any intra-class edge
    for c in range(3):
        edges.append((c * 10, (c + 1) * 10, 5.0 + c))
    for linkage in ("single", "complete", "average"):
        assert dendrogram_purity_py(edges, labels, linkage) == pytest.approx(1.0)


def test_spark_wrapper_matches_py(spark):
    rng = random.Random(11)
    n = 20
    lab_rows = [(i, f"c{i % 4}") for i in range(n)]
    e_rows = [
        (i, j, round(rng.random(), 3))
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < 0.3
    ]
    edges = spark.createDataFrame(e_rows, "src long, dst long, score double")
    labels = spark.createDataFrame(lab_rows, "file_id long, entity_id string")
    got = dendrogram_purity(edges, labels, linkage="average")
    exp = dendrogram_purity_py(
        [(a, b, -d) for a, b, d in e_rows], dict(lab_rows), "average"
    )
    assert got["purity"] == pytest.approx(exp, abs=1e-12)
    assert got["n_leaves"] == n and got["sampled"] is False


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
def test_chain_fixture_closed_form(linkage):
    """The analytic chain fixture behind the eval_dendrogram_chain
    oracle query: on a pure chain with strictly increasing distances,
    every linkage merges prefix-wise (each inter-cluster aggregate is a
    single edge), so purity = sum(cnt*(cnt+1)/rn) / sum(cnt) where cnt
    counts earlier chain nodes sharing the merged node's class."""
    n = 37
    labels = {i: f"c{i % 5}" for i in range(1, n + 1)}
    edges = [(i, i + 1, i * 1e-4 - 1.0) for i in range(1, n)]
    num = 0.0
    den = 0
    for rn in range(2, n + 1):
        cnt = sum(1 for j in range(1, rn) if j % 5 == rn % 5)
        num += cnt * (cnt + 1) / rn
        den += cnt
    assert dendrogram_purity_py(edges, labels, linkage) == pytest.approx(
        num / den, abs=1e-12
    )


def test_edge_collect_is_bounded(spark):
    """The max_leaves sample must bound the EDGE collect too: edges are
    semi-joined to the sampled leaves in Spark, and a surviving edge
    count past max_edges raises instead of silently materializing or
    truncating (round-3 VERDICT item 3 / ADVICE item 1)."""
    n = 60
    labels = spark.createDataFrame(
        [(i, f"c{i % 4}") for i in range(n)], "file_id long, entity_id string"
    )
    # dense-ish graph: 8 forward neighbors per node -> ~8n edges
    edges = spark.createDataFrame(
        [(i, j, 1.0 - abs(i - j) / 100.0)
         for i in range(n) for j in range(i + 1, min(i + 9, n))],
        "src long, dst long, score double",
    )
    with pytest.raises(ValueError, match="max_edges"):
        dendrogram_purity(edges, labels, max_edges=50)
    # sampled leaves: edges touching non-sampled leaves are filtered in
    # Spark (never collected), and the result is identical to running
    # on the pre-filtered subgraph
    r = dendrogram_purity(edges, labels, max_leaves=20)
    assert r["sampled"] and r["n_leaves"] == 20
    lab20 = (
        labels.withColumn("h", F.xxhash64("file_id", F.lit(17)))
        .orderBy("h").limit(20).drop("h")
    )
    keep = {x["file_id"] for x in lab20.collect()}
    sub = edges.where(F.col("src").isin(keep) & F.col("dst").isin(keep))
    r2 = dendrogram_purity(sub, labels, max_leaves=20)
    assert r2["purity"] == r["purity"]


def test_wrapper_n_pairs_exact(spark):
    """n_pairs from the wrapper equals sum_c C(n_c, 2) — exact for any
    label multiset, independent of graph shape (the stitch gives every
    same-class pair an LCA). 10 leaves, classes i%3: 4+3+3 leaves ->
    C(4,2)+C(3,2)+C(3,2) = 6+3+3 = 12 pairs."""
    lab_rows = [(i, f"c{i % 3}") for i in range(10)]
    e_rows = [(i, i + 1, 0.5) for i in range(9)]
    edges = spark.createDataFrame(e_rows, "src long, dst long, score double")
    labels = spark.createDataFrame(lab_rows, "file_id long, entity_id string")
    got = dendrogram_purity(edges, labels, linkage="single")
    assert got["n_pairs"] == 12
