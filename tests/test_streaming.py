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
