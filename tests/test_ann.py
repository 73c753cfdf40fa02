"""ANN search: exact top-k vs numpy brute force; IVF / LSH recall vs
the exact result (the reference's recall@k gate, eval_cluster_linking
.py:488-541)."""

import numpy as np
import pytest

from blink_spark.operators import ann


def _clustered_vectors(n=200, dim=16, k_clusters=8, seed=9):
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((k_clusters, dim)) * 3
    rows = []
    for i in range(n):
        c = i % k_clusters
        rows.append((i, (cents[c] + rng.standard_normal(dim) * 0.3).tolist()))
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    return df


def _numpy_topk(rows, k=5):
    ids = [r[0] for r in rows]
    m = np.asarray([r[1] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    out = {}
    for qi, q in enumerate(ids):
        order = sorted(
            ((sims[qi, ci], -c) for ci, c in enumerate(ids) if c != q), reverse=True
        )
        out[q] = [(-nid, s) for s, nid in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    exp = _numpy_topk(rows, k=5)
    got = {}
    for r in ann.cosine_topk(emb, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    assert set(got) == set(exp)
    for q in exp:
        ordered = [(nid, cos) for _, nid, cos in sorted(got[q])]
        assert ordered == [(nid, pytest.approx(s, abs=1e-6)) for nid, s in exp[q]]


def test_ivf_recall(spark, emb):
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.ivf_topk(emb, k=5, n_cells=8, nprobe=3)
    r = ann.recall_vs_exact(approx, exact)
    assert r >= 0.9, r


def test_ivf_lloyd_refinement_raises_recall(spark):
    """On a hard fixture (24 true clusters, heavy noise, 16 cells,
    nprobe=3) the one-pass Lloyd refinement must beat the raw
    hash-sampled centroids and clear 0.95 (measured: 0.928 -> 0.976)."""
    rng = np.random.RandomState(9)
    K = 24
    cents = rng.standard_normal((K, 12)) * 2
    rows = [
        (i, (cents[i % K] + rng.standard_normal(12) * 0.9).tolist())
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    df.count()
    exact = ann.cosine_topk(df, k=5)
    r0 = ann.recall_vs_exact(
        ann.ivf_topk(df, k=5, n_cells=16, nprobe=3, refine_iters=0), exact
    )
    r1 = ann.recall_vs_exact(
        ann.ivf_topk(df, k=5, n_cells=16, nprobe=3, refine_iters=1), exact
    )
    assert r1 > r0, (r1, r0)
    assert r1 >= 0.95, r1


def test_lsh_recall(spark, emb):
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.lsh_topk(emb, k=5, n_planes=6, n_tables=8, dim=16)
    r = ann.recall_vs_exact(approx, exact)
    assert r >= 0.7, r


def test_ivf_deterministic_across_partitioning(spark, emb):
    a = sorted(map(tuple, ann.ivf_topk(emb.repartition(3), k=3, n_cells=8, nprobe=2)
                   .select("query_id", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, ann.ivf_topk(emb.repartition(11), k=3, n_cells=8, nprobe=2)
                   .select("query_id", "neighbor_id", "rank").collect()))
    assert a == b


def test_nn_descent_improves_on_lsh_init(spark, emb):
    exact = ann.cosine_topk(emb, k=5)
    init = ann.lsh_topk(emb, k=5)
    nnd = ann.nn_descent_topk(emb, k=5, iterations=4)
    r_init = ann.recall_vs_exact(init, exact)
    r_nnd = ann.recall_vs_exact(nnd, exact)
    assert r_nnd >= r_init, (r_nnd, r_init)
    assert r_nnd >= 0.9, r_nnd


def test_nn_descent_deterministic_across_partitioning(spark, emb):
    a = ann.nn_descent_topk(emb, k=5, iterations=2)
    b = ann.nn_descent_topk(emb.repartition(7), k=5, iterations=2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_lsh_parity_recall_and_flow(spark, emb):
    """The SQL-reproducible Rademacher sign-LSH must hit the same
    recall floor as the gaussian-plane kernel (Achlioptas 2001: ±1
    projections preserve the sign statistics)."""
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.lsh_topk_parity(emb, k=5, n_planes=6, n_tables=8, dim=16)
    r = ann.recall_vs_exact(approx, exact)
    assert r >= 0.7, r


# ---------------------------------------------------- product quantization

def test_pq_encode_matches_numpy_argmin(spark, emb):
    """pq_encode picks the L2-nearest codeword per subspace — checked
    against a numpy brute-force argmin over the same codebooks."""
    m, ksub, dim = 4, 8, 16
    cb = ann.pq_codebooks(emb, m=m, ksub=ksub, dim=dim, refine_iters=0)
    cb_rows = {(r["subspace"], r["code"]): np.asarray(r["centroid"]) for r in cb.collect()}
    codes = {
        (r["pq_id"], r["subspace"]): r["code"]
        for r in ann.pq_encode(emb, cb, m=m, dim=dim).collect()
    }
    dsub = dim // m
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            dists = [
                (float(np.sum((sub - cb_rows[(j, c)]) ** 2)), c) for c in range(ksub)
            ]
            best = min(dists)[1]
            assert codes[(r["vec_id"], j)] == best, (r["vec_id"], j)


def test_pq_recall(spark, emb):
    """PQ-ADC + over-fetch rerank recovers the exact top-k on the
    clustered fixture (measured 1.0; floor with slack)."""
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.pq_topk(emb, k=5, m=4, ksub=16, dim=16, overfetch=8)
    assert ann.recall_vs_exact(approx, exact) >= 0.95


def test_pq_parity_recall(spark, emb):
    """The md5 / no-refine parity configuration (what ann_pq_parity
    runs) must hit the same floor — the sample hash is not allowed to
    cost recall."""
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.pq_topk(
        emb, k=5, m=4, ksub=16, dim=16, overfetch=8,
        refine_iters=0, id_hash="md5",
    )
    assert ann.recall_vs_exact(approx, exact) >= 0.95


def test_ivfpq_recall(spark, emb):
    """IVF coarse layer + PQ codes (IndexIVFPQ shape): pruning must
    not break the floor at nprobe=6/8 cells on separable clusters."""
    exact = ann.cosine_topk(emb, k=5)
    approx = ann.pq_topk(
        emb, k=5, m=4, ksub=16, dim=16, overfetch=8, n_cells=8, nprobe=6
    )
    assert ann.recall_vs_exact(approx, exact) >= 0.95


def test_pq_deterministic_across_partitioning(spark, emb):
    a = ann.pq_topk(emb.repartition(1), k=5, m=4, ksub=16, dim=16, overfetch=8)
    b = ann.pq_topk(emb.repartition(13), k=5, m=4, ksub=16, dim=16, overfetch=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivfpq_residual_not_worse_than_raw(spark, emb):
    """Residual encoding (FAISS IndexIVFPQ semantics) must not lose
    recall vs quantizing raw vectors at identical parameters — the
    residuals are strictly smaller targets for the same code budget."""
    exact = ann.cosine_topk(emb, k=5)
    kw = dict(k=5, m=4, ksub=16, dim=16, overfetch=8, n_cells=8, nprobe=6)
    r_res = ann.recall_vs_exact(ann.pq_topk(emb, residual=True, **kw), exact)
    r_raw = ann.recall_vs_exact(ann.pq_topk(emb, residual=False, **kw), exact)
    assert r_res >= r_raw - 1e-9, (r_res, r_raw)
    assert r_res >= 0.95, r_res
