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


def _drain_and_stop(q, timeout=120):
    """Wait for an availableNow query to finish its data, then stop it.

    Plain stateless availableNow queries self-terminate; queries with
    applyInPandasWithState + ProcessingTimeTimeout do NOT (the pending
    state timeout keeps the trigger alive), so awaitTermination alone
    burns its full timeout. Poll until a zero-input batch has committed
    with no data available, then stop() — every data batch is already
    durably committed at that point, and the checkpoint resumes
    cleanly on the next run."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.awaitTermination(2):
            return
        lp = q.lastProgress
        st = q.status or {}
        # after the data is processed the query spins zero-input
        # "cleaning up state" batches indefinitely (isTriggerActive
        # stays True), so that flag must NOT gate the exit
        if (
            lp is not None
            and lp.get("numInputRows", 1) == 0
            and not st.get("isDataAvailable", True)
        ):
            break
    q.stop()
    q.awaitTermination(30)


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
        _drain_and_stop(q, 180)

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


def test_stream_batch_equivalence(spark, tmp_path):
    """The round-3 parity gate: streaming the corpus in two arrival
    waves (exact_dedup_stream + incremental_assign_stream with durable
    state) must produce the same dedup survivors and the same cluster
    PARTITION as the batch pipeline over the identical corpus."""
    import datetime

    from blink_spark import eval as beval
    from blink_spark.functions import text as tx
    from blink_spark.functions.textstats import norm_sha256
    from blink_spark.pipeline import ERPipeline

    corpus = generate_files(spark, n_entities=12, seed=31).cache()
    corpus.count()
    five = corpus.select("repo", "path", "commit", "lang", "content")

    # ---- batch side -------------------------------------------------
    batch = ERPipeline(CFG).run(five)
    batch_clusters = batch.tables["s3_clusters"].select("file_id", "cluster_id").cache()
    batch_clusters.count()
    batch_shas = {
        r["s"] for r in five.select(norm_sha256("content").alias("s")).distinct().collect()
    }

    # ---- stream side: two arrival waves, shared checkpoints ---------
    src = tmp_path / "in_eq"
    src.mkdir()
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"], ts)
        for r in five.collect()
    ]
    half = len(rows) // 2

    def run_wave(wave_rows):
        _write_batch(spark, src, wave_rows, len(wave_rows))
        stream = spark.readStream.schema(FILES_SCHEMA).parquet(str(src))
        s0 = bs.normalize_stream(stream, CFG)
        dq = (
            bs.exact_dedup_stream(s0)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "dedup_out"))
            .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        aq = (
            bs.incremental_assign_stream(
                bs.signature_stream(s0, CFG), jaccard_threshold=0.3
            )
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "assign_out"))
            .option("checkpointLocation", str(tmp_path / "assign_ckpt"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        dq.awaitTermination(180)  # stateless: self-terminates
        _drain_and_stop(aq, 180)

    run_wave(rows[:half])
    run_wave(rows[half:])

    # survivors: exactly one per normalized-content group
    surv = spark.read.parquet(str(tmp_path / "dedup_out"))
    surv_shas = [r["norm_sha"] for r in surv.select("norm_sha").collect()]
    assert sorted(surv_shas) == sorted(set(surv_shas))  # one each
    assert set(surv_shas) == batch_shas

    # clusters: transitive resolution must equal the batch partition
    stream_clusters = bs.resolve_assignments_transitive(
        spark.read.parquet(str(tmp_path / "assign_out"))
    )
    m = beval.pairwise_metrics(
        stream_clusters,
        batch_clusters.select("file_id", F.col("cluster_id").alias("entity_id")),
    )
    assert m["f1"] == 1.0, m
    assert stream_clusters.count() == five.count()
