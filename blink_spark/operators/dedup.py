"""Deduplication suite for training-data curation.

Five dedup families over a document table, all reusing the ER engine's
stage-1/2/3 machinery (blocking -> pair scoring -> clustering), the
same retrieve-then-rerank shape as the reference
(/root/reference/blink/crossencoder/eval_cluster_linking.py:534-573):

  * exact           sha256 hash-groupBy (one shuffle, no pairs)
  * minhash_lsh     shingle -> MinHash -> band -> bucket self-join
  * simhash         bit-majority fingerprint + banded Hamming join
  * ngram_jaccard   token-shingle Jaccard over blocked pairs
  * embedding       cosine near-dup over an array<float> column

Each returns DataFrames with stable column names so the driver's
oracle can diff them against DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions import text
from blink_spark.functions.minhash import minhash_signature_udf
from blink_spark.functions.similarity import array_cosine, token_set_jaccard
from blink_spark.operators import blocking
from blink_spark.operators.connected_components import assign_clusters, connected_components
from blink_spark.operators.pairs import candidate_pairs

from blink_spark.functions.rounding import qround


# ------------------------------------------------------------------ exact

def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_group, group_size) for rows whose NORMALIZED text
    (whitespace/punct-folded) collides; group id = min member id.
    One groupBy — no pair materialization, fully scalable."""
    from blink_spark.functions.textstats import norm_sha256

    keyed = df.select(F.col(id_col), norm_sha256(text_col).alias("norm_sha"))
    groups = keyed.groupBy("norm_sha").agg(
        F.min(id_col).alias("dup_group"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        keyed.join(groups, "norm_sha")
        .select(F.col(id_col), "dup_group", "group_size")
    )


# ------------------------------------------------------------ minhash LSH

def minhash_lsh_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    pair_budget: int = 5_000_000,
) -> DataFrame:
    """Candidate pairs from MinHash-LSH banding, verified by exact
    token-shingle Jaccard >= threshold. The production (xxhash64)
    near-dup path: banding bounds the join, the exact Jaccard on the
    shingle arrays removes LSH false positives."""
    toks = text.tokenize(text_col)
    sh = text.shingles(toks, shingle_k)
    sig_udf = minhash_signature_udf(num_hashes, seed)
    base = df.select(
        F.col(id_col).alias("file_id"),
        (F.col(group_col) if group_col else F.lit("all")).alias("lang"),
        F.array_distinct(sh).alias("shingles"),
    ).withColumn("minhash", sig_udf(text.token_hashes(F.col("shingles"), distinct=False)))
    # signatures feed blocking AND both sides of the verify join —
    # checkpoint once instead of recomputing the UDF three times
    base = base.localCheckpoint(eager=True)
    blocks = blocking.salt_hot_blocks(
        blocking.lsh_blocks(base, "file_id", "lang", "minhash", bands, rows_per_band),
        "file_id",
        pair_budget,
    )
    pairs = candidate_pairs(blocks, "file_id")
    feats = base.select("file_id", "shingles")
    fa = feats.select(F.col("file_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    fb = feats.select(F.col("file_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            qround(token_set_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


# ---------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram (token-shingle) Jaccard >= threshold within a
    blocking group — the brute-force verifier (oracle-friendly; use
    minhash_lsh_dup_pairs at scale)."""
    toks = text.tokenize(text_col)
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.array_distinct(text.shingles(toks, shingle_k)).alias("sh"),
    )
    a = base.select(
        F.col(group_col), F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = base.select(
        F.col(group_col), F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    return (
        a.join(b, group_col)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            qround(token_set_jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- embeddings

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine >= threshold. Brute self-join when no block
    column; at scale pass a coarse bucket (e.g. an LSH sign-bucket or
    IVF cell from operators.ann) as block_col."""
    cols = [F.col(id_col), F.col(vec_col)]
    if block_col:
        cols.append(F.col(block_col))
    base = df.select(*cols)
    key = [block_col] if block_col else []
    a = base.select(
        *key, F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = base.select(
        *key, F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    joined = a.join(b, key) if key else a.crossJoin(b)
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            qround(array_cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


# ------------------------------------------------------------ full dedup

def dedup_clusters(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive closure of dup pairs -> (id, cluster_id); every input
    row keeps exactly one row (singletons cluster with themselves)."""
    comp = connected_components(pairs.select("id_a", "id_b"))
    return assign_clusters(all_ids.select(F.col(id_col)), comp, id_col)


def keep_representatives(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One surviving row per cluster: min id (deterministic)."""
    return (
        clusters.groupBy("cluster_id")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "cluster_id")
    )
