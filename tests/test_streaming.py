"""Structured-Streaming ingest: micro-batch signatures, watermarked
exact dedup across batches, stream-static LSH matching vs an index."""

import time

import pytest
from pyspark.sql import functions as F

from blink_spark import streaming as bs
from blink_spark.corpus import generate_files
from blink_spark.pipeline import ERConfig

CFG = ERConfig(bands=16, rows_per_band=4, num_hashes=64, shingle_k=3)

FILES_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, event_ts timestamp"
)


def _write_batch(spark, d, rows, n):
    df = spark.createDataFrame(rows, FILES_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(str(d))
    return n


def _run_available_now(df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _row(i, content, ts="2026-01-01 00:00:00"):
    import datetime

    return (
        f"org/r{i}", f"src/f{i}.py", f"c{i:08d}", "py", content,
        datetime.datetime.fromisoformat(ts),
    )


def test_exact_dedup_stream_across_batches(spark, tmp_path):
    """First-arrival-wins across micro-batches: the second run resumes
    the SAME checkpoint (durable sink — memory sinks can't recover),
    so a cross-batch duplicate is suppressed by streaming state."""
    src, ckpt, out_dir = tmp_path / "in", tmp_path / "ckpt", tmp_path / "out"
    src.mkdir()

    def run_once():
        stream = spark.readStream.schema(FILES_SCHEMA).parquet(str(src))
        out = bs.exact_dedup_stream(bs.normalize_stream(stream, CFG))
        q = (
            out.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, src, [
        _row(1, "alpha beta gamma"),
        _row(2, "alpha beta gamma"),          # dup within batch
        _row(3, "unique first content"),
    ], 3)
    run_once()
    first = spark.read.parquet(str(out_dir)).collect()
    assert len(first) == 2  # one of 1/2 + 3

    _write_batch(spark, src, [
        _row(4, "alpha beta gamma", "2026-01-01 00:01:00"),   # dup of batch 1
        _row(5, "brand new content", "2026-01-01 00:01:00"),
    ], 2)
    run_once()
    rows = spark.read.parquet(str(out_dir)).collect()
    # only the genuinely new doc was appended by the resumed query
    assert len(rows) == 3
    contents = sorted(r["content"] for r in rows)
    assert sum("brand new" in c for c in contents) == 1
    assert sum("alpha beta" in c for c in contents) == 1


def test_stream_static_lsh_match(spark, tmp_path):
    corpus = generate_files(spark, n_entities=40, seed=21).cache()
    corpus.count()
    index = bs.build_signature_index(
        corpus.select("repo", "path", "commit", "lang", "content"), CFG
    ).cache()
    index.count()

    # arriving files: exact copies of 5 corpus files + 2 novel ones
    import datetime

    sample = corpus.limit(5).collect()
    rows = [
        (
            "incoming/" + r["repo"], r["path"], "newcommit%d" % i, r["lang"],
            r["content"], datetime.datetime(2026, 1, 1),
        )
        for i, r in enumerate(sample)
    ] + [
        _row(100, "totally novel content one two three"),
        _row(101, "another novel document body here"),
    ]
    src = tmp_path / "in2"
    src.mkdir()
    _write_batch(spark, src, rows, len(rows))

    stream = spark.readStream.schema(FILES_SCHEMA).parquet(str(src))
    sigs = bs.signature_stream(bs.normalize_stream(stream, CFG), CFG)
    matches = bs.match_stream_against_catalogue(sigs, index, jaccard_threshold=0.9)
    _run_available_now(matches, "matches", tmp_path / "ckpt2")
    got = spark.sql("select * from matches").collect()
    # every copied file matches >= 1 index entry at jaccard 1.0 ...
    from blink_spark.functions import text as btext

    arriving = spark.createDataFrame(rows, FILES_SCHEMA).select(
        btext.stable_file_id("repo", "path", "commit").alias("fid"), "content"
    ).collect()
    copied = {r["fid"] for r in arriving if "novel" not in r["content"]}
    novel = {r["fid"] for r in arriving} - copied
    matched = {r["file_id"] for r in got}
    assert copied <= matched
    # ... and the novel ones match nothing
    assert not (novel & matched)
    assert all(r["jaccard"] >= 0.9 for r in got)


def test_incremental_assign_stateful(spark, tmp_path):
    """applyInPandasWithState: duplicates arriving in a LATER
    micro-batch are assigned to the first batch's representative via
    streaming state; novel files become new representatives."""
    src, ckpt, out_dir = tmp_path / "in2", tmp_path / "ckpt2", tmp_path / "out2"
    src.mkdir()

    base = "def parse(x):\n    return [int(t) for t in x.split(',')]\n" * 4
    other = "class Widget:\n    def render(self):\n        return '<div/>'\n" * 4

    def run_once():
        stream = spark.readStream.schema(FILES_SCHEMA).parquet(str(src))
        sigs = bs.signature_stream(bs.normalize_stream(stream, CFG), CFG)
        out = bs.incremental_assign_stream(sigs, jaccard_threshold=0.5)
        q = (
            out.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_batch(spark, src, [_row(1, base), _row(2, other)], 2)
    run_once()
    # batch 2: near-dup of file 1 (one token tweaked) + a fresh file
    _write_batch(spark, src, [
        _row(3, base.replace("parse", "parse2", 1)),
        _row(4, "SELECT a, b FROM t WHERE x > 0 ORDER BY a\n" * 4),
    ], 2)
    run_once()

    from blink_spark.functions import text as tx

    ids = {
        i: r
        for i, r in enumerate(
            spark.createDataFrame(
                [_row(1, base), _row(2, other),
                 _row(3, base.replace("parse", "parse2", 1)),
                 _row(4, "SELECT a, b FROM t WHERE x > 0 ORDER BY a\n" * 4)],
                FILES_SCHEMA,
            )
            .select(tx.stable_file_id("repo", "path", "commit").alias("fid"))
            .collect(),
            start=1,
        )
    }
    res = spark.read.parquet(str(out_dir))
    # per-file final cluster: best non-self match across bands
    final = {
        r["file_id"]: r["cluster_id"]
        for r in bs.resolve_assignments(res).collect()
    }
    f1, f2, f3, f4 = (ids[i]["fid"] for i in (1, 2, 3, 4))
    assert final[f3] == final[f1]          # later near-dup joins file 1's cluster
    assert final[f2] not in (final[f1],)   # distinct content stays separate
    assert final[f4] == f4                 # novel file is its own representative
    assert final[f1] == f1                 # first arrival is the representative
