"""Tokenize / shingle / hash invariants vs pure-Python oracles."""

import hashlib
import re

from pyspark.sql import functions as F

from blink_spark.functions import text


def py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]


def py_shingles(toks: list[str], k: int) -> list[str]:
    if not toks:
        return []
    if len(toks) <= k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


SAMPLES = [
    "def foo(a, b):\n    return a + b  # Mixed CASE and 123 numbers",
    "",
    "ONE",
    "a b c d e f g h",
    "x!@#$%^&*()y",
]


def test_tokenize_matches_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, s string")
    got = {r["id"]: r["t"] for r in df.select("id", text.tokenize("s").alias("t")).collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == py_tokens(s), (i, s)


def test_shingles_match_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, s string")
    out = df.select(
        "id", text.shingles(text.tokenize("s"), 3).alias("sh")
    ).collect()
    got = {r["id"]: r["sh"] for r in out}
    for i, s in enumerate(SAMPLES):
        assert got[i] == py_shingles(py_tokens(s), 3), (i, s)


def test_sha256_matches_hashlib(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, s string")
    got = {r["id"]: r["h"] for r in df.select("id", text.content_sha256("s").alias("h")).collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == hashlib.sha256(s.encode()).hexdigest()


def test_stable_file_id_partitioning_independent(spark):
    rows = [(f"r{i}", f"p{i}", f"c{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    a = set(
        r[0]
        for r in df.repartition(2).select(text.stable_file_id("repo", "path", "commit")).collect()
    )
    b = set(
        r[0]
        for r in df.repartition(13).select(text.stable_file_id("repo", "path", "commit")).collect()
    )
    assert a == b and len(a) == 100
