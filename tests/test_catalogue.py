"""S3 catalogue loading: JSONL -> id maps -> LinkPipeline round trip
(the reference's _load_candidates + idx<->id maps, main_dense.py:88-116)."""

import json

import pytest
from pyspark.sql import functions as F

from blink_spark.io import catalogue as cat


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cat") / "entities.jsonl"
    rows = [
        {"entity_id": f"C{i:04d}", "title": f"Entity {i}",
         "text": f"canonical description number {i} " * 4, "type": "py"}
        for i in range(25)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_load_and_id_map(spark, jsonl_path):
    df = cat.load_catalogue_jsonl(spark, jsonl_path)
    assert df.count() == 25
    assert df.columns == ["entity_id", "title", "text", "type"]
    m = cat.catalogue_id_map(df)
    assert m.select("entity_key").distinct().count() == 25
    # deterministic at any parallelism
    a = sorted(r["entity_key"] for r in m.collect())
    b = sorted(
        r["entity_key"]
        for r in cat.catalogue_id_map(df.repartition(7)).collect()
    )
    assert a == b


def test_catalogue_roundtrip_through_linking(spark, jsonl_path):
    """Mentions are noisy copies of catalogue text; linking maps each
    back to its external id through the id map."""
    from blink_spark.linking import LinkPipeline
    from blink_spark.pipeline import ERConfig

    df = cat.load_catalogue_jsonl(spark, jsonl_path)
    files = cat.catalogue_as_files(df)
    mentions = files.select(
        F.lit("mentions").alias("repo"),
        F.col("path"),
        F.concat(F.lit("m-"), F.col("commit")).alias("commit"),
        "lang",
        F.concat(F.col("content"), F.lit("\nmention noise suffix")).alias("content"),
    )
    cfg = ERConfig(bands=16, rows_per_band=4, num_hashes=64, shingle_k=3)
    res = LinkPipeline(cfg, mention_knn=0).run(mentions, files)
    out = cat.map_predictions_to_external(res.tables["pred"], files)
    # recover which external id each mention SHOULD get (same path)
    from blink_spark.functions.text import stable_file_id

    want = mentions.select(
        stable_file_id("repo", "path", "commit").alias("file_id"),
        F.regexp_replace(F.col("path"), "^entity/", "").alias("gold_external"),
    )
    j = out.join(want, "file_id")
    n = j.count()
    correct = j.where(F.col("pred_external_id") == F.col("gold_external")).count()
    assert n == 25
    assert correct / n >= 0.96, (correct, n)
