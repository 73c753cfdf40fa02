"""Dedup suite over the clone-family corpus: exact groups, LSH recall
of exact dups, transitive clustering invariants."""

from pyspark.sql import functions as F

from blink_spark.functions import text
from blink_spark.operators import dedup


def _docs(corpus):
    return corpus.select(
        text.stable_file_id("repo", "path", "commit").alias("doc_id"),
        F.col("lang"),
        F.col("content").alias("text"),
    )


def test_exact_dup_groups(spark, corpus):
    docs = _docs(corpus)
    groups = dedup.exact_dup_groups(docs)
    assert groups.count() == docs.count()  # every row kept exactly once
    # exact/base variants share content => at least one group of size >= 2
    assert groups.where(F.col("group_size") >= 2).count() > 0
    # group id is a member of the group (min doc_id)
    bad = groups.groupBy("dup_group").agg(F.min("doc_id").alias("mn")).where(
        F.col("dup_group") != F.col("mn")
    )
    assert bad.count() == 0


def test_minhash_lsh_recovers_exact_dups(spark, corpus):
    docs = _docs(corpus)
    pairs = dedup.minhash_lsh_dup_pairs(
        docs, shingle_k=3, jaccard_threshold=0.9
    )
    # every exact-duplicate pair must be found (jaccard == 1)
    sha = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha")
    )
    a = sha.select(F.col("sha"), F.col("doc_id").alias("id_a"))
    b = sha.select(F.col("sha"), F.col("doc_id").alias("id_b"))
    exact_pairs = (
        a.join(b, "sha").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )
    n_exact = exact_pairs.count()
    assert n_exact > 0
    missed = exact_pairs.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).count()
    assert missed == 0, f"LSH missed {missed}/{n_exact} exact-dup pairs"


def test_dedup_clusters_and_representatives(spark, corpus):
    docs = _docs(corpus)
    pairs = dedup.ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.8
    )
    clusters = dedup.dedup_clusters(pairs, docs.select("doc_id"))
    assert clusters.count() == docs.count()
    assert clusters.select("doc_id").distinct().count() == docs.count()
    reps = dedup.keep_representatives(clusters)
    assert reps.count() == clusters.select("cluster_id").distinct().count()
    # representative belongs to its own cluster
    joined = reps.join(clusters, ["doc_id", "cluster_id"], "left_semi")
    assert joined.count() == reps.count()


def test_embedding_near_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [0.0, 0.0, 0.0]),      # zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert got == {(1, 2)}


# ---------------------------------------------- exact substring segments

def test_duplicate_segments_hand_corpus(spark):
    # doc 1 and 2 share the window "a b c"; doc 3 is disjoint; doc 4
    # repeats the shared window twice within one doc
    rows = [
        (1, "a b c x"),
        (2, "y a b c"),
        (3, "p q r s"),
        (4, "a b c a b c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    segs = dedup.duplicate_segments(docs, k=3, min_docs=2).collect()
    assert len(segs) == 1  # only "a b c" spans >= 2 docs
    row = segs[0]
    assert row["n_docs"] == 3
    # occurrences: doc1 x1, doc2 x1, doc4 x2
    assert row["n_occ"] == 4


def test_segment_dup_coverage_hand_corpus(spark):
    rows = [
        (1, "a b c x"),       # windows: "a b c","b c x" -> 1 of 2 dup
        (2, "y a b c"),       # windows: "y a b","a b c" -> 1 of 2 dup
        (3, "p q r s"),       # no dup windows
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cov = {
        r["doc_id"]: r
        for r in dedup.segment_dup_coverage(docs, k=3, min_docs=2).collect()
    }
    assert cov[1]["n_windows"] == 2 and cov[1]["dup_windows"] == 1
    assert cov[1]["coverage"] == 0.5
    assert cov[3]["dup_windows"] == 0 and cov[3]["coverage"] == 0.0


def test_duplicate_segments_short_doc_whole_text_window(spark):
    # docs below k tokens collapse to a single whole-doc window, so two
    # short identical docs are caught as a duplicated segment
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")],
        "doc_id long, text string",
    )
    segs = dedup.duplicate_segments(docs, k=5, min_docs=2).collect()
    assert len(segs) == 1 and segs[0]["n_docs"] == 2


def test_segment_coverage_matches_segments(spark, corpus):
    # total dup window occurrences must agree between the two views
    docs = _docs(corpus)
    occ = (
        dedup.duplicate_segments(docs, k=5, min_docs=2)
        .agg(F.sum("n_occ")).collect()[0][0]
    ) or 0
    cov = (
        dedup.segment_dup_coverage(docs, k=5, min_docs=2)
        .agg(F.sum("dup_windows")).collect()[0][0]
    ) or 0
    assert occ == cov


def test_embedding_rademacher_recall(spark):
    """method='rademacher' (the SQL-parity bucketing) must recover the
    exact near-dup pairs like the gaussian kernel does."""
    import numpy as np

    from blink_spark.operators import dedup

    rng = np.random.RandomState(9)
    cents = rng.standard_normal((8, 16)) * 3
    rows = [
        (i, (cents[i % 8] + rng.standard_normal(16) * 0.1).tolist())
        for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    emb.count()
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            emb, threshold=0.9, method="exact"
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            emb, threshold=0.9, method="rademacher", n_planes=8, n_tables=8, dim=16
        ).collect()
    }
    assert exact
    assert got <= exact
    assert len(got & exact) / len(exact) >= 0.9
