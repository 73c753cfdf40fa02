"""Blocking: salting respects the pair budget; keys deterministic."""

from pyspark.sql import functions as F

from blink_spark.operators import blocking


def test_salt_hot_blocks_respects_budget(spark):
    # one hot block of 1000 rows, one small block of 5
    rows = [("hot", i) for i in range(1000)] + [("cold", 10_000 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "block_key string, file_id long")
    budget = 5000  # rows_budget = sqrt(2*5000) = 100
    salted = blocking.salt_hot_blocks(df, "file_id", pair_budget=budget)
    sizes = salted.groupBy("block_key").count().collect()
    hot_sizes = [r["count"] for r in sizes if r["block_key"].startswith("hot|")]
    cold = [r for r in sizes if r["block_key"].startswith("cold|")]
    assert len(hot_sizes) >= 5, "hot block must be split"
    assert max(hot_sizes) * (max(hot_sizes) - 1) / 2 <= budget * 2.2  # hash imbalance slack
    assert len(cold) == 1 and cold[0]["count"] == 5
    # row preservation
    assert salted.count() == 1005


def test_salting_deterministic_across_partitioning(spark):
    rows = [("hot", i) for i in range(500)]
    df = spark.createDataFrame(rows, "block_key string, file_id long")
    a = sorted(
        (r["block_key"], r["file_id"])
        for r in blocking.salt_hot_blocks(df.repartition(3), "file_id", 1000).collect()
    )
    b = sorted(
        (r["block_key"], r["file_id"])
        for r in blocking.salt_hot_blocks(df.repartition(11), "file_id", 1000).collect()
    )
    assert a == b


def test_block_stats(spark):
    rows = [("k1", 1), ("k1", 2), ("k1", 3), ("k2", 4)]
    df = spark.createDataFrame(rows, "block_key string, file_id long")
    got = {r["block_key"]: (r["n_rows"], r["n_pairs"]) for r in blocking.block_stats(df).collect()}
    assert got == {"k1": (3, 3), "k2": (1, 0)}
