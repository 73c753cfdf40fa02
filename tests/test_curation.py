"""Curation-operator suite: PII detect/redact, repetition stats,
benchmark decontamination — value oracles on handcrafted fixtures plus
cross-engine (DuckDB) parity of the SQL twins and plan-shape pins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from blink_spark.functions import pii
from blink_spark.operators import curation


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------- PII

PII_DOCS = [
    (1, "plain prose, no identifiers at all"),
    (2, "write a.b+c@ex-ample.org today"),
    (3, "two mails: x@y.io and w.z@q.co plus host 10.0.0.1"),
    (4, "call +1 415-555-0199 or +4930123456"),
    (5, "ip 255.255.255.255 then 1.2.3.4, mail-less"),
    (6, "not-an-ip 1.2.3 and not@mail and +12 too short"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_pii_counts_known_values(pii_df):
    rows = {
        r["doc_id"]: r
        for r in pii_df.select(
            "doc_id", *[v.alias(k) for k, v in pii.pii_counts("text").items()]
        ).collect()
    }
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) == (0, 0, 0)
    assert rows[2]["n_emails"] == 1
    assert (rows[3]["n_emails"], rows[3]["n_ipv4"]) == (2, 1)
    assert rows[4]["n_phones"] == 2
    assert rows[5]["n_ipv4"] == 2
    assert (rows[6]["n_emails"], rows[6]["n_ipv4"], rows[6]["n_phones"]) == (0, 0, 0)


def test_pii_redact_replaces_every_match(pii_df):
    red = pii_df.select("doc_id", pii.redact("text").alias("red")).collect()
    joined = " ".join(r["red"] for r in red)
    assert "@" not in joined.replace("not@mail", "")  # non-match survives
    assert "<EMAIL>" in joined and "<IP>" in joined and "<PHONE>" in joined
    # redacted text has no residual matches of any class
    again = (
        pii_df.select(pii.redact(pii.redact("text")).alias("twice"),
                      pii.redact("text").alias("once"))
        .where(F.col("twice") != F.col("once"))
        .count()
    )
    assert again == 0


def test_pii_sql_twin_parity(spark, pii_df):
    got = {
        r["doc_id"]: r
        for r in pii_df.select(
            "doc_id",
            *[v.alias(k) for k, v in pii.pii_counts("text").items()],
            pii.redacted_sha256("text").alias("sha"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", PII_DOCS)
    cols = pii.pii_counts_sql("text")
    for doc_id, ne, ni, np_, sha in con.execute(
        f"SELECT doc_id, {cols['n_emails']}, {cols['n_ipv4']}, "
        f"{cols['n_phones']}, {pii.redacted_sha256_sql('text')} FROM d"
    ).fetchall():
        g = got[doc_id]
        assert (g["n_emails"], g["n_ipv4"], g["n_phones"], g["sha"]) == (
            ne, ni, np_, sha,
        ), doc_id


# ------------------------------------------------------------ repetition

REP_DOCS = [
    # 4 lines, 'dup' twice (len 3): dup_line_frac = (4-3)/4,
    # dup_line_char_frac = 6 / (3+3+5+4) = 6/15
    (1, "dup\ndup\nalpha\nbeta"),
    # all distinct lines
    (2, "one two three\nfour five six"),
    # empty doc
    (3, "   \n\n  "),
    # 'a b' bigram dominates: tokens a b a b a -> bigrams
    # [a b, b a, a b, b a] top frac 2/4; 5 tokens -> 1 five-gram
    (4, "a b a b a"),
]


@pytest.fixture(scope="module")
def rep_df(spark):
    return spark.createDataFrame(REP_DOCS, "doc_id long, text string")


def test_repetition_known_values(rep_df):
    rows = {r["doc_id"]: r for r in curation.repetition_stats(rep_df).collect()}
    assert rows[1]["n_lines"] == 4
    assert rows[1]["dup_line_frac"] == pytest.approx(0.25)
    assert rows[1]["dup_line_char_frac"] == pytest.approx(6 / 15, abs=1e-6)
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["n_lines"] == 0 and rows[3]["top_2gram_frac"] == 0.0
    assert rows[4]["top_2gram_frac"] == pytest.approx(0.5)
    assert rows[4]["dup_5gram_frac"] == 0.0
    assert set(rows) == {1, 2, 3, 4}  # zero-gram docs still present


def test_repetition_plan_partial_agg_no_cartesian(rep_df):
    plan = _plan(curation.repetition_stats(rep_df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # line/gram counting must map-side combine before the exchange
    assert "partial_count" in plan or "HashAggregate" in plan


# -------------------------------------------------------- decontamination

def test_decontaminate_flags_exact_excerpt(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated content with its own distinct words here"),
            (3, "another clean document nothing shared with the benchmark set"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in curation.decontaminate(corpus, bench, n=8, threshold=1).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["n_overlap_grams"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_overlap_grams"] == 0
    assert not rows[3]["contaminated"]
    assert len(rows) == 3  # every corpus doc reported


def test_decontaminate_threshold_and_set_semantics(spark):
    # doc repeats the leaked 8-gram run; distinct-per-doc counting must
    # not double-count the repeats
    corpus = spark.createDataFrame(
        [(1, " ".join(["w%d" % i for i in range(8)] * 3))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, " ".join("w%d" % i for i in range(8)))],
        "doc_id long, text string",
    )
    out = curation.decontaminate(corpus, bench, n=8, threshold=10).collect()[0]
    assert out["n_overlap_grams"] < 10  # distinct grams only
    assert not out["contaminated"]  # threshold respected
