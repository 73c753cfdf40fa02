"""Approximate nearest-neighbor search over an embedding column.

The reference's retrieval stack is FAISS: IndexFlatIP exact search
below 10k vectors, IndexIVFFlat (nlist=sqrt(n), nprobe=sqrt(nlist))
above (/root/reference/blink/biencoder/data_process_mult.py:225-250),
plus an HNSW variant (/root/reference/blink/index/faiss_indexer.py:72-137).
Here the same exact->approximate ladder is expressed as DataFrames:

  * cosine_topk       exact brute-force (the IndexFlatIP analog) —
                      join + window top-k; broadcast the smaller side
  * ivf_topk          IVF: deterministic centroid sample, cell
                      assignment via one vectorized numpy matmul UDF,
                      queries probe nprobe cells (the IndexIVFFlat
                      analog; cell equi-join replaces the cross join)
  * hyperplane_buckets random-hyperplane sign-LSH bucket keys (the
                      HNSW/ANN alternative; bucket equi-join)

Scores are rounded to 6 dp so results hash identically across engines
and parallelism levels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from blink_spark.functions.similarity import array_cosine

from blink_spark.functions.rounding import qround


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cosine, rank).

    queries=None -> self-search (excludes self-pairs). The join is a
    cartesian per partition pair; with broadcast_queries the corpus is
    streamed once and never shuffled — the right baseline shape when
    |queries| << |corpus|.
    """
    q = queries if queries is not None else corpus
    qs = q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    if broadcast_queries:
        qs = F.broadcast(qs)
    scored = (
        qs.crossJoin(cs)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(array_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    return _topk_window(scored, k)


# ----------------------------------------------------------------- IVF

def _matmul_assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding -> nprobe nearest centroid ids (by cosine).
    One numpy matmul per Arrow batch — the FAISS coarse quantizer."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in series])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cn.T  # [batch, n_cells]
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            yield pd.Series([row.astype(np.int32).tolist() for row in order])

    return _assign


def ivf_cells(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic centroid sample: the n_cells rows with smallest
    xxhash64(id, seed) — order-free, parallelism-independent (the
    kmeans-free analog of FAISS's clustering; one refinement pass can
    be layered on without changing the contract)."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    return np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: corpus rows live in their 1 nearest cell; queries probe
    their nprobe nearest cells; exact cosine + top-k within probed
    cells. Equi-join on cell_id replaces the cross join — shuffle
    shrinks by ~n_cells/nprobe."""
    cents = ivf_cells(corpus, n_cells, id_col, vec_col, seed)
    assign1 = _matmul_assign_udf(cents, 1)
    assignp = _matmul_assign_udf(cents, nprobe)
    cs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("cell_id", F.element_at(assign1(F.col("c_vec")), 1))
    q = queries if queries is not None else corpus
    qs = (
        q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cell_id", F.explode(assignp(F.col("q_vec"))))
    )
    scored = (
        qs.join(cs, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(array_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk_window(scored, k)


# ----------------------------------------------------- hyperplane LSH

def hyperplane_bucket_udf(dim: int, n_planes: int = 16, n_tables: int = 4, seed: int = 42):
    """pandas UDF: embedding -> array of n_tables sign-LSH bucket keys.
    Table t's key packs the signs of n_planes fixed random hyperplanes
    into an int; vectorized numpy matmul per batch."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    weights = (2 ** np.arange(n_planes, dtype=np.int64))[None, :]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in series])
            out = np.empty((m.shape[0], n_tables), dtype=np.int64)
            for t in range(n_tables):
                bits = (m @ planes[t].T) > 0  # [batch, n_planes]
                out[:, t] = (bits * weights).sum(axis=1)
            yield pd.Series([row.tolist() for row in out])

    return _buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH ANN: candidates share (table, bucket) in >=1 of
    n_tables; exact cosine rescoring + top-k. Recall is tuned by
    (n_planes down, n_tables up) like the reference's nprobe."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    udf = hyperplane_bucket_udf(dim, n_planes, n_tables, seed)

    def keyed(df: DataFrame, idn: str, vn: str) -> DataFrame:
        return df.select(F.col(id_col).alias(idn), F.col(vec_col).alias(vn)).select(
            idn, vn, F.posexplode(udf(F.col(vn))).alias("table_id", "bucket")
        )

    q = queries if queries is not None else corpus
    qs = keyed(q, "query_id", "q_vec")
    cs = keyed(corpus, "neighbor_id", "c_vec")
    scored = (
        qs.join(cs, ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(array_cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk_window(scored, k)


def recall_vs_exact(approx: DataFrame, exact: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approximate
    search (the reference's recall@k,
    /root/reference/blink/biencoder/eval_cluster_linking.py:488-541)."""
    hit = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    n_exact = exact.count()
    return (hit.count() / n_exact) if n_exact else 1.0
