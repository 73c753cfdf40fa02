"""Checkpointed stage tables + per-partition lineage/metrics.

The reference memoizes every expensive stage to pickle files and
resumes by checking file existence
(/root/reference/blink/biencoder/eval_cluster_linking.py:291-346,
411-415, 429-432, 477-486). We re-express that contract as stage
TABLES: write-once parquet (Iceberg when a catalog is configured —
same API, `format="iceberg"`), `exists()` -> skip recompute, plus a
lineage table recording per-partition row counts and a metrics table
per stage. A killed job rerun with the same output root resumes from
the last completed stage without recomputing scored blocks.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath.
    Detection only — configuring a catalog is the deployment's job
    (``spark.sql.catalog.<name>`` confs)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


# Iceberg partition transforms per stage table, tuned for the queries
# that read each one back: `lang` is the hot pruning key (per-language
# reruns, language-partitioned scoring), band/block keys are high-
# cardinality so they get hash BUCKETS, never identity partitions.
DEFAULT_PARTITION_SPEC: dict[str, list] = {
    "s0_normalized": ["lang"],
    "s1_signatures": ["lang"],
    "s1_blocks": [("bucket", 64, "block_key")],
    "s2_pairs": [("bucket", 64, "id_a")],
    "s2_scores": [("bucket", 64, "id_a")],
    "s2_edges": [("bucket", 64, "id_a")],
}


def _transform_cols(spec: list):
    """['lang', ('bucket', 64, 'block_key')] -> pyspark partitioning
    Columns for DataFrameWriterV2.partitionedBy."""
    from pyspark.sql.functions import partitioning as P

    cols = []
    for s in spec:
        if isinstance(s, tuple) and s[0] == "bucket":
            cols.append(P.bucket(int(s[1]), s[2]))
        else:
            cols.append(F.col(s))
    return cols


class StageStore:
    """Stage-table IO rooted at ``base``. Parquet by default; use
    ``StageStore.for_env`` to bind to an Iceberg catalog when the
    runtime jar + a catalog conf are present (the checkpoint/resume
    contract — exists() -> skip recompute — is identical either way;
    reference semantics: eval_cluster_linking.py:291-346
    pickle-if-exists)."""

    def __init__(self, spark: SparkSession, base: str, fmt: str = "parquet"):
        self.spark = spark
        self.base = base.rstrip("/")
        self.fmt = fmt
        self._jvm_fs = None

    @classmethod
    def for_env(
        cls,
        spark: SparkSession,
        base: str,
        catalog_table_prefix: str | None = None,
        partition_spec: dict[str, list] | None = None,
    ) -> "StageStore":
        """Bind to Iceberg iff BOTH the runtime jar is on the classpath
        and the caller names a catalog table prefix (e.g.
        ``"local.blink.run1"`` with ``spark.sql.catalog.local``
        configured); otherwise the parquet store rooted at ``base``.
        SURVEY §7's 'all tables Iceberg, parquet fallback' binding."""
        if catalog_table_prefix:
            if iceberg_available(spark):
                return IcebergStageStore(
                    spark, catalog_table_prefix, partition_spec=partition_spec
                )
            import warnings

            warnings.warn(
                f"StageStore.for_env: catalog prefix "
                f"{catalog_table_prefix!r} requested but the Iceberg "
                "runtime jar is not on the classpath — falling back to "
                f"parquet at {base!r}",
                stacklevel=2,
            )
        return cls(spark, base)

    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def fs_scratch_path(self, name: str) -> str | None:
        """A real filesystem dir under this store for iterative
        operators' durable checkpoints (the CC loop), or None when the
        store is catalog-table-backed and has no path to offer —
        callers then fall back to session scratch."""
        return self.path(name)

    def sub(self, namespace: str) -> "StageStore":
        """A StageStore rooted at a sub-namespace of this one. Flows
        with DIFFERENT stage semantics but the same stage NAMES (e.g.
        a linking run's s0..s2 over mentions+catalogue vs a dedup
        run's over one corpus) must not resume each other's tables —
        callers namespace instead of sharing the root."""
        return StageStore(self.spark, self.path(namespace), fmt=self.fmt)

    # -- existence via Hadoop FS (works for file://, hdfs://, s3a://) --
    def _fs(self):
        if self._jvm_fs is None:
            jvm = self.spark.sparkContext._jvm
            jsc = self.spark.sparkContext._jsc
            conf = jsc.hadoopConfiguration()
            uri = jvm.java.net.URI(self.base)
            self._jvm_fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        return self._jvm_fs

    def exists(self, name: str) -> bool:
        jvm = self.spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.path(name) + "/_SUCCESS")
        return bool(self._fs().exists(p))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    # ------------------------------------------------ lineage / metrics
    def write_lineage(self, df: DataFrame, stage: str) -> dict:
        """Per-partition row counts for ``stage`` (appended). Returns
        totals so callers can log them as metrics too."""
        lin = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("ts", F.lit(time.time()))
        )
        lin.write.mode("append").format(self.fmt).save(self.path("_lineage"))
        agg = lin.agg(
            F.sum("rows").alias("rows"), F.count(F.lit(1)).alias("partitions")
        ).collect()[0]
        return {"rows": int(agg["rows"] or 0), "partitions": int(agg["partitions"])}

    def write_metrics(self, stage: str, metrics: dict) -> None:
        row = {
            "stage": stage,
            "ts": float(time.time()),
            "metrics_json": json.dumps(metrics, sort_keys=True, default=str),
        }
        self.spark.createDataFrame([row]).write.mode("append").format(self.fmt).save(
            self.path("_metrics")
        )

    def read_metrics(self) -> DataFrame:
        return self.read("_metrics")


class IcebergStageStore(StageStore):
    """StageStore bound to an Iceberg catalog: stage tables are catalog
    TABLES (``<prefix>_<stage>``), existence is ``tableExists`` (the
    catalog's commit is the atomicity guarantee — no _SUCCESS marker
    games), and writes carry the stage's partition transforms
    (DEFAULT_PARTITION_SPEC: identity on ``lang`` for the pruning-hot
    tables, hash buckets for band/pair keys) so downstream reads prune
    at the manifest level. Resume semantics identical to the parquet
    store; same reference contract (eval_cluster_linking.py:291-346).

    ``prefix`` is ``catalog.namespace.run`` — stage names append with
    ``_`` (Iceberg identifiers nest on dots)."""

    def __init__(
        self,
        spark: SparkSession,
        prefix: str,
        partition_spec: dict[str, list] | None = None,
    ):
        super().__init__(spark, base=prefix, fmt="iceberg")
        self.prefix = prefix
        self.partition_spec = (
            DEFAULT_PARTITION_SPEC if partition_spec is None else partition_spec
        )

    def table(self, name: str) -> str:
        return f"{self.prefix}_{name}"

    def fs_scratch_path(self, name: str) -> None:
        return None  # catalog tables have no caller-visible directory

    def sub(self, namespace: str) -> "IcebergStageStore":
        return IcebergStageStore(
            self.spark,
            f"{self.prefix}_{namespace}",
            partition_spec=self.partition_spec,
        )

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self.table(name))

    def write(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        spec = (
            list(partition_by)
            if partition_by
            else self.partition_spec.get(name, [])
        )
        # keep only spec keys the stage schema actually has — the spec
        # is advisory per stage NAME, schemas evolve
        have = set(df.columns)
        spec = [
            s for s in spec if (s[2] if isinstance(s, tuple) else s) in have
        ]
        w = df.writeTo(self.table(name)).using("iceberg")
        if spec:
            w = w.partitionedBy(*_transform_cols(spec))
        w.createOrReplace()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self.table(name))

    def _append(self, df: DataFrame, name: str) -> None:
        if self.exists(name):
            df.writeTo(self.table(name)).append()
        else:
            df.writeTo(self.table(name)).using("iceberg").create()

    def write_lineage(self, df: DataFrame, stage: str) -> dict:
        lin = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("ts", F.lit(time.time()))
        )
        self._append(lin, "_lineage")
        agg = lin.agg(
            F.sum("rows").alias("rows"), F.count(F.lit(1)).alias("partitions")
        ).collect()[0]
        return {"rows": int(agg["rows"] or 0), "partitions": int(agg["partitions"])}

    def write_metrics(self, stage: str, metrics: dict) -> None:
        row = {
            "stage": stage,
            "ts": float(time.time()),
            "metrics_json": json.dumps(metrics, sort_keys=True, default=str),
        }
        self._append(self.spark.createDataFrame([row]), "_metrics")
