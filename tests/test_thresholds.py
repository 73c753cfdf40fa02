"""A7/A8 threshold selection: exact 1-D k-means DP vs brute force,
the SQL-twin 2-means split vs DuckDB, and the sweep argmax."""

import itertools

import duckdb
import numpy as np
import pytest

from blink_spark.operators.thresholds import (
    exact_2means_split,
    exact_2means_split_sql,
    kmeans1d,
    threshold_candidates,
    threshold_ladder,
)


def brute_sse(v, w, segments):
    tot = 0.0
    for i, j in segments:
        vv, ww = v[i : j + 1], w[i : j + 1]
        mu = np.average(vv, weights=ww)
        tot += float(np.sum(ww * (vv - mu) ** 2))
    return tot


def all_partitions(n, k):
    """All ways to cut 0..n-1 into k contiguous segments."""
    for cuts in itertools.combinations(range(1, n), k - 1):
        bounds = [0, *cuts, n]
        yield [(bounds[m], bounds[m + 1] - 1) for m in range(k)]


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_kmeans1d_matches_bruteforce(k):
    rng = np.random.RandomState(7)
    for _ in range(5):
        n = rng.randint(k, 9)
        v = np.sort(rng.uniform(0, 1, n))
        w = rng.randint(1, 5, n).astype(float)
        centers = kmeans1d(v, w, k)
        got = brute_sse(
            v, w, _segments_from_centers(v, w, centers)
        )
        want = min(brute_sse(v, w, segs) for segs in all_partitions(n, min(k, n)))
        assert got == pytest.approx(want, abs=1e-9)


def _segments_from_centers(v, w, centers):
    """Recover contiguous segments by assigning each value to its
    nearest center (1-D optimal clusters are contiguous)."""
    idx = np.argmin(np.abs(v[:, None] - centers[None, :]), axis=1)
    segs, start = [], 0
    for i in range(1, len(v)):
        if idx[i] != idx[i - 1]:
            segs.append((start, i - 1))
            start = i
    segs.append((start, len(v) - 1))
    return segs


def test_kmeans1d_weighted_equals_expanded():
    v = np.array([0.1, 0.2, 0.8, 0.9])
    w = np.array([3.0, 1.0, 2.0, 1.0])
    expanded = np.repeat(v, w.astype(int))
    a = kmeans1d(v, w, 2)
    b = kmeans1d(expanded, np.ones_like(expanded), 2)
    assert np.allclose(a, b)


def test_threshold_candidates_ladder(spark):
    df = spark.createDataFrame(
        [(float(x),) for x in [0.1, 0.11, 0.12, 0.85, 0.86, 0.9]], "score double"
    )
    cands = threshold_candidates(df, "score", k=2)
    assert cands[0] == 0.0  # reference prepends 0
    assert cands == sorted(cands)
    # two clear clusters -> centers near the two group means
    assert cands[1] == pytest.approx(0.11, abs=1e-6)
    assert cands[2] == pytest.approx(0.87, abs=1e-6)


def test_exact_2means_split_matches_dp(spark):
    vals = [0.05, 0.1, 0.12, 0.6, 0.72, 0.75, 0.8]
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    row = exact_2means_split(df, "score").collect()[0]
    centers = kmeans1d(np.array(vals), np.ones(len(vals)), 2)
    assert row["mean_lo"] == pytest.approx(centers[0], abs=1e-6)
    assert row["mean_hi"] == pytest.approx(centers[1], abs=1e-6)
    assert row["threshold"] == pytest.approx((centers[0] + centers[1]) / 2, abs=1e-6)


def test_exact_2means_sql_twin_hash_parity(spark, tmp_path):
    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.uniform(0, 0.3, 200), rng.uniform(0.6, 1.0, 150)]
    ).tolist()
    types = [("a" if i % 3 else "b") for i in range(len(vals))]
    pdf = spark.createDataFrame(
        list(zip(types, [float(v) for v in vals])), "t string, score double"
    )
    p = str(tmp_path / "scores.parquet")
    pdf.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)

    spark_rows = sorted(
        (r["t"], r["split_at"], r["mean_lo"], r["mean_hi"], r["threshold"])
        for r in exact_2means_split(back, "score", by="t").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW scores AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    sql = exact_2means_split_sql("scores", "score", by="t")
    duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows  # exact equality, not approx


def test_threshold_ladder_argmax(spark, corpus, gold):
    from blink_spark.pipeline import ERConfig, ERPipeline

    pipe = ERPipeline(ERConfig())
    res = pipe.run(corpus, until="score")
    edges = res.tables["s2_scores"].select("id_a", "id_b", "score")
    sweep = threshold_ladder(edges, gold, n_thresholds=4)
    rows = sweep.results.collect()
    assert len(rows) >= 2
    assert sweep.best["f1"] == max(r["f1"] for r in rows)
    # a sane ladder beats the cluster-everything threshold 0 on precision
    assert sweep.best["f1"] >= 0.9
