"""MinHash kernel vs pure-Python oracle; determinism; LSH banding."""

import random

from pyspark.sql import functions as F

from blink_spark.functions import text
from blink_spark.functions.minhash import band_keys, minhash_py, minhash_signature_udf


def _sig_df(spark, docs, n_hashes=32, seed=42):
    df = spark.createDataFrame(docs, "id int, s string")
    hs = df.select("id", text.token_hashes(text.shingles(text.tokenize("s"), 3)).alias("h"))
    sig = hs.select(
        "id", F.col("h"), minhash_signature_udf(n_hashes, seed)(F.col("h")).alias("sig")
    )
    return {r["id"]: (list(r["h"]), list(r["sig"])) for r in sig.collect()}


def test_udf_matches_python_oracle(spark):
    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("alpha beta gamma delta eps zeta eta".split()) for _ in range(rng.randint(0, 40))))
        for i in range(25)
    ]
    got = _sig_df(spark, docs)
    for i, (h, sig) in got.items():
        assert sig == minhash_py(h, 32, 42), i


def test_signature_deterministic_across_partitioning(spark):
    docs = [(i, f"tok{i} " * 10 + "shared words here") for i in range(50)]
    df = spark.createDataFrame(docs, "id int, s string")
    udf = minhash_signature_udf(16, 42)

    def sigs(parts):
        return {
            r["id"]: tuple(r["sig"])
            for r in df.repartition(parts)
            .select("id", udf(text.token_hashes(text.shingles(text.tokenize("s"), 3))).alias("sig"))
            .collect()
        }

    assert sigs(2) == sigs(11)


def test_similar_docs_share_bands(spark):
    base = " ".join(f"w{i}" for i in range(200))
    near = base.replace("w100", "x100")  # tiny edit
    far = " ".join(f"z{i}" for i in range(200))
    got = _sig_df(spark, [(0, base), (1, near), (2, far)], n_hashes=32)
    df = spark.createDataFrame(
        [(i, got[i][1]) for i in got], "id int, sig array<bigint>"
    )
    bands = {
        r["id"]: list(r["b"]) for r in df.select("id", band_keys(F.col("sig"), 8, 4).alias("b")).collect()
    }
    shared_near = sum(1 for x, y in zip(bands[0], bands[1]) if x == y)
    shared_far = sum(1 for x, y in zip(bands[0], bands[2]) if x == y)
    assert shared_near >= 1
    assert shared_far == 0


def test_empty_doc_sentinel_signature(spark):
    got = _sig_df(spark, [(0, ""), (1, "")], n_hashes=8)
    assert got[0][1] == got[1][1]
    assert all(v >= (1 << 61) for v in got[0][1])
