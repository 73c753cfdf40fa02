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


class StageStore:
    """Stage-table IO rooted at ``base``. Parquet by default; pass
    ``fmt='iceberg'`` + a table prefix when an Iceberg catalog exists
    (not available in this sandbox — the checkpoint/resume contract is
    identical either way)."""

    def __init__(self, spark: SparkSession, base: str, fmt: str = "parquet"):
        self.spark = spark
        self.base = base.rstrip("/")
        self.fmt = fmt
        self._jvm_fs = None

    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

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
