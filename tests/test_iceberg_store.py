"""Iceberg-backed StageStore binding (SURVEY §7: 'all tables Iceberg,
partitioned … parquet fallback').

The sandbox has no Iceberg runtime jar, so the catalog-bound test
SKIPS here and runs on any deployment that ships
iceberg-spark-runtime; the fallback + contract tests always run.
Reference resume semantics under test: eval_cluster_linking.py:291-346
(pickle-if-exists memoization, re-expressed as tableExists -> read).
"""

import pytest
from pyspark.sql import functions as F

from blink_spark.io.tables import (
    DEFAULT_PARTITION_SPEC,
    IcebergStageStore,
    StageStore,
    iceberg_available,
)


def test_for_env_without_prefix_is_parquet(spark, tmp_path):
    store = StageStore.for_env(spark, str(tmp_path / "run"))
    assert type(store) is StageStore and store.fmt == "parquet"


def test_for_env_falls_back_loudly_without_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — fallback path not reachable")
    with pytest.warns(UserWarning, match="falling back to parquet"):
        store = StageStore.for_env(
            spark, str(tmp_path / "run"), catalog_table_prefix="local.blink.t"
        )
    assert type(store) is StageStore
    # the fallback still honors the full stage contract
    df = spark.range(5).select(F.col("id"), F.lit("en").alias("lang"))
    assert not store.exists("s0_normalized")
    store.write(df, "s0_normalized")
    assert store.exists("s0_normalized")
    assert store.read("s0_normalized").count() == 5
    assert store.fs_scratch_path("_cc_scratch") is not None


def test_partition_spec_prunes_to_schema():
    # advisory spec keys absent from the schema must be dropped, both
    # identity and bucket transforms (exercised without a catalog by
    # inspecting the filter the Iceberg writer applies)
    have = {"file_id", "bands"}
    spec = DEFAULT_PARTITION_SPEC["s1_blocks"] + ["lang"]
    kept = [s for s in spec if (s[2] if isinstance(s, tuple) else s) in have]
    assert kept == []  # block_key and lang both absent
    have = {"block_key", "file_id"}
    kept = [s for s in spec if (s[2] if isinstance(s, tuple) else s) in have]
    assert kept == [("bucket", 64, "block_key")]


def test_sub_namespacing_stays_in_family(spark, tmp_path):
    store = StageStore(spark, str(tmp_path / "run"))
    link = store.sub("link_stages")
    assert type(link) is StageStore
    assert link.base.endswith("run/link_stages")
    ice = IcebergStageStore(spark, "local.blink.run")
    sub = ice.sub("link_stages")
    assert isinstance(sub, IcebergStageStore)
    assert sub.table("s0_normalized") == "local.blink.run_link_stages_s0_normalized"
    assert sub.fs_scratch_path("_cc_scratch") is None


def test_iceberg_stage_store_end_to_end(spark, tmp_path):
    """Runs only where iceberg-spark-runtime is on the classpath: bind
    a hadoop catalog at a temp warehouse, run the resume contract
    through catalog tables, and check the partition spec landed.
    Catalog confs resolve lazily on first reference, so setting them
    on the live session is enough."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.itest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.itest.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.itest.warehouse", str(tmp_path / "warehouse")
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS itest.blink")
    store = StageStore.for_env(
        spark, str(tmp_path / "unused"), catalog_table_prefix="itest.blink.run1"
    )
    assert isinstance(store, IcebergStageStore)
    df = spark.range(10).select(
        F.col("id").alias("file_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    assert not store.exists("s0_normalized")
    store.write(df, "s0_normalized")
    assert store.exists("s0_normalized")
    back = store.read("s0_normalized")
    assert back.count() == 10
    # identity lang partition from DEFAULT_PARTITION_SPEC
    parts = spark.sql(
        "SELECT * FROM itest.blink.run1_s0_normalized.partitions"
    )
    assert parts.count() == 2  # en / de
    # lineage + metrics append through the catalog
    store.write_lineage(back, "s0_normalized")
    store.write_metrics("s0_normalized", {"elapsed_sec": 0.0})
    assert store.read_metrics().count() == 1
