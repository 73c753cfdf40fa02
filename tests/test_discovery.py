"""G9 entity-discovery: dropped entities' mentions must re-attach to
the nearest surviving entity; drop-all mode must rediscover the gold
clone families from the mention-mention graph alone
(eval_entity_discovery.py:246-308, :322-370)."""

import pytest
from pyspark.sql import functions as F

from blink_spark.corpus import generate_files
from blink_spark.discovery import entity_discovery, exclude_entities
from blink_spark.eval import nmi_ari
from blink_spark.functions import text
from blink_spark.linking import LinkPipeline
from blink_spark.pipeline import ERConfig

CFG = ERConfig(bands=16, rows_per_band=4, num_hashes=64, shingle_k=3)


def _five(df):
    return df.select("repo", "path", "commit", "lang", "content")


def _catalogue_rows(corpus):
    from pyspark.sql import Window as W

    w = W.partitionBy("entity_id").orderBy("commit")
    return (
        corpus.where(F.col("variant") == "base")
        .withColumn("repo", F.lit("catalog"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@pytest.fixture(scope="module")
def disco_fixture(spark):
    corpus = generate_files(spark, n_entities=60, seed=23).cache()
    corpus.count()
    catalogue = _five(_catalogue_rows(corpus)).cache()
    mentions = _five(corpus).cache()
    fid = text.stable_file_id("repo", "path", "commit")
    ment_gold = corpus.select(fid.alias("file_id"), "entity_id").cache()
    cat_ids = _catalogue_rows(corpus).select(
        fid.alias("cat_file_id"), "entity_id"
    ).cache()
    ment_gold.count(), cat_ids.count()
    return mentions, catalogue, ment_gold, cat_ids


def test_reattach_to_nearest_survivor(spark, disco_fixture):
    """Give every entity a TWIN catalogue row (the family's 'edit'
    variant re-homed as its own catalogue entry), drop the primary
    rows of a quarter of the entities, and check the affected
    mentions re-attach to exactly their twin — the provable nearest
    surviving entity (same clone family; other families share no
    blocks). Mirrors the reference's nearest-surviving-entity fetch
    (eval_entity_discovery.py:246-308); with blocking-based retrieval
    a mention with NO similar survivor stays unattached (documented
    deviation from FAISS, which always returns something)."""
    mentions, catalogue, ment_gold, cat_ids = disco_fixture
    corpus = generate_files(spark, n_entities=60, seed=23)
    fid = text.stable_file_id("repo", "path", "commit")
    twin_rows = (
        corpus.where(F.col("variant") == "edit")
        .withColumn("repo", F.lit("catalog2"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("entity_id").orderBy("commit")
    twin_rows = (
        twin_rows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    ).cache()
    twin_ids = twin_rows.select(fid.alias("twin_file_id"), "entity_id")
    cat2 = catalogue.unionByName(_five(twin_rows))
    dropped_ents = cat_ids.where(F.col("entity_id") % 4 == 0)
    dropped = dropped_ents.select(F.col("cat_file_id").alias("entity_id"))
    pipe = LinkPipeline(CFG, mention_knn=2)
    flagged, men_ids, _ = pipe.score_joint(mentions, cat2)
    surv = exclude_entities(flagged, dropped)
    best = pipe.entity_candidates(surv, k=1)
    dropped_set = {r["entity_id"] for r in dropped.collect()}
    rows = best.collect()
    assert len(rows) > 0
    assert all(r["entity_id"] not in dropped_set for r in rows)
    # every mention of a dropped entity re-attaches to its OWN twin
    expect = {
        r["file_id"]: r["twin_file_id"]
        for r in ment_gold.join(
            dropped_ents.select("entity_id"), "entity_id", "left_semi"
        )
        .join(ment_gold.select("file_id", "entity_id"), "file_id")
        .join(twin_ids, "entity_id")
        .collect()
    }
    got = {r["mention_id"]: r["entity_id"] for r in rows}
    assert expect, "fixture produced no affected mentions"
    miss = {m: (got.get(m), t) for m, t in expect.items() if got.get(m) != t}
    assert not miss, f"{len(miss)}/{len(expect)} mis-attached: {list(miss.items())[:5]}"


def test_discovery_sweep_subset_drop(spark, disco_fixture):
    """Full G9 flow with a dropped subset: the sweep's best rung must
    cluster surviving-entity mentions correctly (high NMI/ARI — gold
    here maps mentions to catalogue ids, dropped entities' mentions
    re-attach elsewhere so perfection is impossible by construction)."""
    mentions, catalogue, ment_gold, cat_ids = disco_fixture
    gold = ment_gold.join(cat_ids, "entity_id").select(
        "file_id", F.col("cat_file_id").alias("entity_id")
    )
    dropped = cat_ids.where(F.col("entity_id") % 10 == 0).select(
        F.col("cat_file_id").alias("entity_id")
    )
    res = entity_discovery(
        mentions, catalogue, gold, dropped=dropped, cfg=CFG, mention_knn=2,
        thresholds=[0.0, 0.3, 0.99],
    )
    assert res.results.count() == 3
    assert res.best["threshold"] != 0.0  # reference excludes 0
    assert res.best["average"] >= 0.8, res.best


def test_discovery_drop_all_recovers_families(spark, disco_fixture):
    """drop_all mode: mention-mention clustering alone must rediscover
    the clone families (NMI/ARI ~ 1 on the synthetic corpus at the
    best threshold)."""
    mentions, _, ment_gold, _ = disco_fixture
    catalogue = disco_fixture[1]
    res = entity_discovery(
        mentions, catalogue, ment_gold, drop_all=True, cfg=CFG,
        n_thresholds=5,
    )
    assert res.best["average"] >= 0.95, res.best
    # the winning clusters table really is mention-granular
    assert res.tables["clusters"].count() == mentions.count()
