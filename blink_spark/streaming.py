"""Structured-Streaming ingest: incremental dedup/linking of ARRIVING
files against an indexed corpus.

The reference is batch-only (every eval loads pickled embeddings,
/root/reference/blink/biencoder/eval_cluster_linking.py:291-346); at
production scale new repositories arrive continuously, so the engine
gets a streaming front end:

  * ``normalize_stream``   the s0 transform on a readStream source —
                           stateless Column exprs work unchanged
  * ``signature_stream``   the fused Arrow signature kernel (pandas
                           UDFs run per micro-batch)
  * ``exact_dedup_stream`` watermarked dropDuplicates on the
                           normalized-content hash: first arrival
                           wins, state bounded by the watermark
  * ``match_stream_against_catalogue``
                           stream-static band-key equi-join against a
                           precomputed signature index + exact-Jaccard
                           verify — the incremental MinHash-LSH path
                           (only NEW files are hashed per batch; the
                           static index is a plain table the batch
                           pipeline already produces)

All operators return streaming DataFrames; callers pick the sink
(``availableNow`` triggers in tests, continuous micro-batches in
production) and a checkpointLocation for exactly-once state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions import text
from blink_spark.functions.minhash import content_signature_features_udf
from blink_spark.functions.rounding import qround
from blink_spark.functions.similarity import presorted_jaccard_udf
from blink_spark.pipeline import ERConfig


def normalize_stream(files: DataFrame, cfg: ERConfig | None = None) -> DataFrame:
    """s0 on a stream: stable file_id + sha256 invariant (stateless)."""
    c = cfg or ERConfig()
    cols = [
        text.stable_file_id(*c.key_cols).alias("file_id"),
        *[F.col(k) for k in c.key_cols],
        F.col(c.lang_col).alias("lang"),
        F.col(c.content_col).alias("content"),
        text.content_sha256(c.content_col).alias("sha256"),
    ]
    if "event_ts" in files.columns:
        cols.append(F.col("event_ts"))
    return files.select(*cols)


def signature_stream(
    s0: DataFrame, cfg: ERConfig | None = None
) -> DataFrame:
    """s1 on a stream: ONE fused Arrow pass per micro-batch (bands +
    sorted unique shingle hashes for downstream verify joins)."""
    c = cfg or ERConfig()
    feat = content_signature_features_udf(
        c.num_hashes, c.seed, shingle_k=c.shingle_k,
        bands=c.bands, rows_per_band=c.rows_per_band, return_shingles=True,
    )
    keep = [col for col in ("event_ts",) if col in s0.columns]
    return s0.select(
        "file_id", "lang", "sha256", *keep,
        feat(F.col("content"), F.col("lang")).alias("ft"),
    ).select(
        "file_id", "lang", "sha256", *keep,
        F.col("ft.bands").alias("bands"),
        F.col("ft.su").alias("su"),
    )


def exact_dedup_stream(
    s0: DataFrame,
    watermark_delay: str = "10 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """First-arrival-wins exact dedup across micro-batches: state keyed
    by the normalized-content hash, expired past the watermark (bounded
    memory — the unbounded-state dropDuplicates is exactly what you
    must NOT run on an infinite stream)."""
    from blink_spark.functions.textstats import norm_sha256

    keyed = s0.withColumn("norm_sha", norm_sha256("content"))
    return keyed.withWatermark(ts_col, watermark_delay).dropDuplicates(
        ["norm_sha"]
    )


def build_signature_index(files: DataFrame, cfg: ERConfig | None = None) -> DataFrame:
    """The STATIC side: (file_id, band block_key, su) for the existing
    corpus — write it once with the batch pipeline, read it as a plain
    table; the stream equi-joins against it per micro-batch."""
    c = cfg or ERConfig()
    sigs = signature_stream(normalize_stream(files, c), c)
    return sigs.select(
        F.col("file_id").alias("index_id"),
        F.col("su").alias("index_su"),
        F.explode("bands").alias("block_key"),
    )


def match_stream_against_catalogue(
    stream_sigs: DataFrame,
    index: DataFrame,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Stream-static incremental MinHash-LSH: each arriving file joins
    the prebuilt band index on its band keys (hash equi-join — Spark
    plans the static side as a broadcast/shuffled lookup per batch),
    then exact shingle-Jaccard verifies candidates.
    Returns (file_id, index_id, jaccard)."""
    keyed = stream_sigs.select(
        "file_id", "su", F.explode("bands").alias("block_key")
    )
    jac = qround(
        presorted_jaccard_udf()(F.col("su"), F.col("index_su")), 6
    ).alias("jaccard")
    return (
        keyed.join(index, "block_key")
        .where(F.col("file_id") != F.col("index_id"))
        .select("file_id", "index_id", jac)
        .where(F.col("jaccard") >= jaccard_threshold)
        .dropDuplicates(["file_id", "index_id"])
    )
