"""Stage-1 blocking: composite block keys + hot-block salting.

The analog of the reference's type-partitioned FAISS retrieval
(/root/reference/blink/biencoder/eval_cluster_linking.py:434-458,
501-524): `lang` plays `type` (search only within your own partition),
MinHash-LSH band keys play the IVF buckets
(/root/reference/blink/biencoder/data_process_mult.py:238-249).

Hot-block handling is ours alone (the reference OOMs on giant gold
clusters and approximates around them,
/root/reference/blink/biencoder/train_biencoder_mst.py:578-621): any
block whose pair count n·(n-1)/2 exceeds a budget is split by a
secondary salt so no single join task explodes. The salt is a
deterministic hash of (file_id, block_key), so different bands cut a
hot family at different boundaries and the union of bands still links
the family into one component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blink_spark.functions.minhash import band_keys


def exact_block_key(lang: Column, sha: Column) -> Column:
    """Degenerate blocking for exact duplicates: (lang, sha256)."""
    return F.concat_ws("|", F.lit("x"), lang, sha)


def lsh_blocks(
    df: DataFrame,
    id_col: str = "file_id",
    lang_col: str = "lang",
    sig_col: str = "minhash",
    bands: int = 16,
    rows: int = 8,
) -> DataFrame:
    """Explode LSH band keys -> (block_key, <id>). One row per (doc, band)."""
    bk = band_keys(F.col(sig_col), bands, rows)
    return (
        df.select(F.col(id_col), F.col(lang_col), F.posexplode(bk).alias("band", "bhash"))
        .select(
            F.concat_ws("|", F.col(lang_col), F.col("band"), F.col("bhash")).alias("block_key"),
            F.col(id_col),
        )
    )


def salt_hot_blocks(
    blocks: DataFrame,
    id_col: str = "file_id",
    pair_budget: int = 5_000_000,
    max_salts: int = 1024,
) -> DataFrame:
    """Split any block with > pair_budget pairs via secondary salting.

    Returns (block_key, <id>) with the salt folded into block_key.
    Block sizes come from one aggregation; the per-block salt count is
    ceil(n / rows_budget) where rows_budget keeps each salted
    sub-block under the pair budget. Small blocks pass through with
    salt 0 (key unchanged shape, so downstream is oblivious).
    """
    # rows_budget: n rows -> ~n^2/2 pairs; keep sub-block rows <= sqrt(2*budget)
    rows_budget = max(2, int((2 * pair_budget) ** 0.5))
    sizes = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
    nsalts = F.least(
        F.greatest(F.ceil(F.col("n") / rows_budget).cast("int"), F.lit(1)),
        F.lit(max_salts),
    )
    sized = blocks.join(
        F.broadcast(sizes.where(F.col("n") > rows_budget).withColumn("nsalts", nsalts)),
        "block_key",
        "left",
    )
    salt = F.when(
        F.col("nsalts").isNull(), F.lit(0)
    ).otherwise(F.pmod(F.xxhash64(F.col(id_col), F.col("block_key")), F.col("nsalts")).cast("int"))
    return sized.select(
        F.concat_ws("|", F.col("block_key"), salt).alias("block_key"),
        F.col(id_col),
    )


def salt_hot_blocks_numeric(
    blocks: DataFrame,
    id_col: str = "file_id",
    pair_budget: int = 5_000_000,
    max_salts: int = 1024,
) -> DataFrame:
    """salt_hot_blocks for NUMERIC (long) block keys: the salted key is
    xxhash64(block_key, salt); unsalted blocks keep their key. Numeric
    keys keep the block shuffle at 8 bytes/row and avoid JVM string
    building on the hot path (the pipeline's stage-1 path)."""
    rows_budget = max(2, int((2 * pair_budget) ** 0.5))
    sizes = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
    nsalts = F.least(
        F.greatest(F.ceil(F.col("n") / rows_budget).cast("int"), F.lit(1)),
        F.lit(max_salts),
    )
    sized = blocks.join(
        F.broadcast(sizes.where(F.col("n") > rows_budget).withColumn("nsalts", nsalts)),
        "block_key",
        "left",
    )
    salt = F.pmod(F.xxhash64(F.col(id_col), F.col("block_key")), F.col("nsalts"))
    salted_key = F.when(F.col("nsalts").isNull(), F.col("block_key")).otherwise(
        F.xxhash64(F.col("block_key"), salt)
    )
    return sized.select(salted_key.alias("block_key"), F.col(id_col))


def block_stats(blocks: DataFrame) -> DataFrame:
    """Per-block size + implied pair count (skew telemetry)."""
    return (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("n_pairs", (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("long"))
    )
