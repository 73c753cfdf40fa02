"""Entity-catalogue loading + id maps (S3).

The reference loads its entity dictionary from a JSONL catalogue and
builds idx<->id maps for linking
(/root/reference/blink/main_dense.py:88-116 `_load_candidates`:
one JSON object per line with title/text/ids, local_idx2wikipedia_id
etc.). Spark shape: `spark.read.json` (schema supplied — no sampling
pass), a DETERMINISTIC 64-bit entity key derived from the stable
external id (never a row index: indices depend on partitioning; a
hash of the external id is identical at any parallelism), and the id
map as a plain DataFrame to broadcast-join predictions back to
external ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOGUE_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType()),   # external stable id (cui/wikipedia_id analog)
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)


def load_catalogue_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL -> (entity_id, title, text, type) with an explicit schema
    (one pass; no inference job over a 100-TB catalogue)."""
    return spark.read.schema(CATALOGUE_SCHEMA).json(path)


def catalogue_id_map(catalogue: DataFrame) -> DataFrame:
    """(entity_key, entity_id, title): entity_key is the engine-side
    64-bit node id — xxhash64 of the external id, deterministic at any
    parallelism (the reference's local_idx2wikipedia_id map, keyed by
    value instead of position)."""
    return catalogue.select(
        F.xxhash64(F.lit("cat"), F.col("entity_id")).alias("entity_key"),
        "entity_id",
        "title",
    )


def catalogue_as_files(catalogue: DataFrame) -> DataFrame:
    """Adapt a catalogue to the pipeline's (repo, path, commit, lang,
    content) input shape so it can flow through LinkPipeline: repo is
    a fixed 'catalogue' namespace, path/commit derive from the stable
    external id (so stable_file_id == the id-map's entity_key basis),
    lang from type when present."""
    return catalogue.select(
        F.lit("catalogue").alias("repo"),
        F.concat(F.lit("entity/"), F.col("entity_id")).alias("path"),
        F.col("entity_id").alias("commit"),
        F.coalesce(F.col("type"), F.lit("und")).alias("lang"),
        F.concat_ws("\n", F.col("title"), F.col("text")).alias("content"),
    )


def map_predictions_to_external(
    pred: DataFrame, catalogue_files: DataFrame, id_map_cols: tuple[str, str, str] = ("repo", "path", "commit")
) -> DataFrame:
    """Join (file_id, pred_entity_id) predictions back to external
    catalogue ids via the deterministic file-id of the adapted
    catalogue rows (broadcast — the catalogue id map is the small
    side)."""
    from blink_spark.functions.text import stable_file_id

    ids = catalogue_files.select(
        stable_file_id(*id_map_cols).alias("pred_entity_id"),
        F.regexp_replace(F.col("path"), "^entity/", "").alias("pred_external_id"),
    )
    return pred.join(F.broadcast(ids), "pred_entity_id", "left")
