"""Text-analysis kernels: every Spark Column expression must agree
with its DuckDB SQL twin (the pairing __spark_entry__ relies on)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from blink_spark.functions import text, textstats as ts

DOCS = [
    "The quick brown fox, and the lazy dog!",
    "el perro que no es un gato y la casa",
    "der hund und die katze von dem haus ist im garten",
    "le chat et la maison des gens en une ville que",
    "",
    "    ",
    "x",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 8,
    "punct!!! ### $$$ %%% mixed WITH Case And_Under_Scores 123",
    "the the the the of of to to in in is is",
]


def _duck(sql_expr: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ", ".join("(?)" for _ in DOCS) + ") t(text)", DOCS)
    return [r[0] for r in con.execute(f"SELECT {sql_expr} FROM d").fetchall()]


def _spark_vals(spark, col, name="v"):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    return [r[name] for r in df.select(col.alias(name)).collect()]


def test_token_stats_parity(spark):
    stats = ts.token_stats("text")
    sqls = ts.token_stats_sql("text")
    for key in stats:
        got = _spark_vals(spark, stats[key])
        exp = _duck(sqls[key])
        assert got == exp, key


def test_langid_parity(spark):
    got = _spark_vals(spark, ts.lang_guess("text"))
    exp = _duck(ts.lang_guess_sql("text"))
    assert got == exp
    # the English / Spanish / German / French fixtures resolve correctly
    assert got[0] == "en" and got[1] == "es" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "und"


def test_quality_parity(spark):
    comps = ts.quality_components("text")
    sqls = ts.quality_components_sql("text")
    for key in comps:
        got = _spark_vals(spark, F.round(comps[key], 6))
        exp = _duck(f"round({sqls[key]}, 6)")
        assert got == pytest.approx(exp, abs=1e-9), key
    assert _spark_vals(spark, ts.quality_score("text")) == pytest.approx(
        _duck(ts.quality_score_sql("text")), abs=1e-9
    )


def test_fingerprint_parity(spark):
    got_sha = _spark_vals(spark, ts.norm_sha256("text"))
    assert got_sha == _duck(ts.norm_sha256_sql("text"))
    for k in (2, 5):
        got_fp = _spark_vals(spark, ts.min_shingle_fingerprint("text", k))
        assert got_fp == _duck(ts.min_shingle_fingerprint_sql("text", k)), k


def test_shingles_sql_matches_spark(spark):
    sh = text.shingles(text.tokenize("text"), 3)
    got = _spark_vals(spark, sh)
    exp = _duck(ts.shingles_sql(ts.tokens_sql("text"), 3))
    assert got == exp
