"""SparkSession factory with scale-appropriate defaults.

AQE on (skew-join splitting + partition coalescing is our runtime
defence for hot blocks, replacing the reference's manual cluster-size
caps, cf. /root/reference/blink/biencoder/train_biencoder_mst.py:578-621),
Arrow on (all heavy Python kernels are vectorized pandas UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """~40% of physical RAM, clamped to [2g, 48g]. A hardcoded big heap
    risked OS-level OOM kills on smaller hosts; BLINK_SPARK_DRIVER_MEM
    still overrides for tuned deployments."""
    try:
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
    except (ValueError, OSError, AttributeError):
        total_gb = 16.0
    return f"{max(2, min(48, int(total_gb * 0.4)))}g"


def get_spark(
    app_name: str = "blink_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int N -> ``local[N]``; "*" -> all; None -> respect an
    existing session / SPARK_GRAFT_CPUS / all cores.
    """
    # Under spark-submit, the JVM gateway already exists (PythonRunner
    # exports PYSPARK_GATEWAY_PORT before exec'ing the driver script)
    # and carries --master as a JVM property; calling .master() would
    # silently turn a cluster submit into a single-box run, so when
    # the env var is present (and the caller didn't force cores) the
    # builder sets NO master and the submitted one wins. A plain
    # `python script.py` launches the gateway itself, so the var is
    # absent and we pick local[N]. (Reading SparkConf() before the
    # gateway exists returns an EMPTY Python-side conf — it cannot
    # detect the submitted master; the env var is the signal.)
    under_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        and cores is None
        and "SPARK_GRAFT_CPUS" not in os.environ
    )
    if "PYSPARK_GATEWAY_PORT" in os.environ and not under_submit:
        # A stray SPARK_GRAFT_CPUS (or explicit cores=) under
        # spark-submit overrides the submitted --master with local[N],
        # silently turning a cluster job into a single-box run. Honor
        # the override (tests rely on it) but never silently.
        import warnings

        src = "cores=" if cores is not None else "SPARK_GRAFT_CPUS"
        warnings.warn(
            f"get_spark: running under spark-submit but {src} forces a "
            f"local[N] master, overriding the submitted --master. Unset "
            f"SPARK_GRAFT_CPUS / drop cores= to run on the cluster.",
            stacklevel=2,
        )
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        # = cores, not a multiple: Python-UDF stages pay a per-task
        # worker cost, and local-mode wall is task-latency-sensitive;
        # AQE re-splits skewed partitions when needed anyway
        ncores = (os.cpu_count() or 8) if cores == "*" else int(cores)
        shuffle_partitions = max(8, ncores)

    builder = SparkSession.builder
    if not under_submit:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # keep coalescing from shrinking below the core count: stage-2
        # scoring is Python-UDF-heavy, where per-ROW cost dwarfs the
        # per-BYTE cost AQE's size heuristic sees (7 partitions on a
        # 32-core box serialized the pair scorer before this)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("BLINK_SPARK_DRIVER_MEM", _default_driver_mem()))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
