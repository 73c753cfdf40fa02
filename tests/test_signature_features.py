"""Fused stage-1 kernel: consistency with the pure-Python oracles and
determinism across parallelism."""

import math
import random
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from blink_spark.functions import minhash as mh


def _docs(n=30, seed=21):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(60)]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 50))) for _ in range(n)
    ]
    docs += ["", "one", "Tab\tand, punct!"]
    return docs


def test_features_match_python_oracle(spark):
    docs = _docs()
    df = spark.createDataFrame(
        [(i, d, "py") for i, d in enumerate(docs)], "id long, content string, lang string"
    )
    udf = mh.content_signature_features_udf(32, seed=42, shingle_k=3, bands=4, rows_per_band=8)
    rows = {r["id"]: r["ft"] for r in df.select("id", udf("content", "lang").alias("ft")).collect()}
    for i, doc in enumerate(docs):
        toks = mh.tokenize_py(doc)
        ft = rows[i]
        assert ft["n_tokens"] == len(toks)
        if not toks:
            assert ft["tu"] == [] and ft["tc"] == [] and ft["tnorm"] == 0.0
            continue
        hs = pd.util.hash_array(np.asarray(toks, dtype=object)).view(np.int64)
        cnt = Counter(hs.tolist())
        exp_tu = sorted(cnt)
        assert ft["tu"] == exp_tu
        assert ft["tc"] == [cnt[t] for t in exp_tu]
        assert ft["tnorm"] == pytest.approx(
            math.sqrt(sum(v * v for v in cnt.values())), abs=1e-12
        )
        # minhash: same as the standalone oracle over the same hashes
        exp_sig = mh.minhash_py(hs.tolist(), 32, 42, shingle_k=3)
        assert ft["minhash"] == exp_sig
        # band keys: recomputable from the signature
        sig_u64 = (np.asarray(ft["minhash"], dtype=np.int64).astype(np.uint64) << np.uint64(1))
        # band_keys_py expects the PRE-shift signature; recompute from hashes
        a, b = mh.perm_params(32, 42)
        sh = np.asarray(mh.shingle_hashes_py(hs.tolist(), 3), dtype=np.uint64)
        v = (sh[:, None] * a[None, :] + b[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        raw_sig = v.min(axis=0)
        g = int(pd.util.hash_array(np.asarray(["py"], dtype=object))[0])
        exp_bands = mh.band_keys_py(raw_sig, g, 4, 8).tolist()
        assert ft["bands"] == exp_bands


def test_shingle_hashes_py_edge_cases():
    assert mh.shingle_hashes_py([], 3) == []
    one = mh.shingle_hashes_py([5], 3)
    assert len(one) == 1
    assert mh.shingle_hashes_py([1, 2, 3, 4], 2) == [
        mh.shingle_hashes_py([1, 2], 2)[0],
        mh.shingle_hashes_py([2, 3], 2)[0],
        mh.shingle_hashes_py([3, 4], 2)[0],
    ]


def test_udf_deterministic_across_partitioning(spark):
    docs = _docs(50, seed=4)
    df = spark.createDataFrame(
        [(i, d, "l") for i, d in enumerate(docs)], "id long, content string, lang string"
    )
    udf = mh.content_signature_features_udf(16, 7, 2, bands=4, rows_per_band=4)
    a = {r["id"]: (r["ft"]["minhash"], r["ft"]["bands"])
         for r in df.repartition(2).select("id", udf("content", "lang").alias("ft")).collect()}
    b = {r["id"]: (r["ft"]["minhash"], r["ft"]["bands"])
         for r in df.repartition(9).select("id", udf("content", "lang").alias("ft")).collect()}
    assert a == b
