"""MinHash signatures + LSH band keys.

This is stage 1's approximate candidate generation — the analog of the
reference's bi-encoder embedding + FAISS IVF index
(/root/reference/blink/biencoder/data_process_mult.py:225-291): the
signature is the "embedding", band keys are the "index buckets", and
(bands, rows) tunes recall the way nlist/nprobe does
(/root/reference/blink/common/params.py:181-184).

Split of labor:
  * string -> int64 hashing happens JVM-side (xxhash64, codegen) in
    functions.text.token_hashes;
  * the n_hashes permutations run in ONE Arrow-vectorized numpy kernel
    (pandas UDF) — no per-row Python, per BASELINE.json input_hint.

Permutation family: v_i(h) = (a_i * h + b_i) mod 2^64, a_i odd
(multiply-add over Z/2^64 — deterministic, seedable, vectorized;
same construction as classic multiply-shift hashing). Signature value
is (v >> 1) so it fits a signed Spark LongType.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def perm_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-add parameters; a forced odd."""
    rng = np.random.RandomState(seed)
    # two 32-bit draws per 64-bit param (RandomState caps at 2**32)
    def draw(n: int) -> np.ndarray:
        hi = rng.randint(0, 2**32, size=n, dtype=np.uint64)
        lo = rng.randint(0, 2**32, size=n, dtype=np.uint64)
        return (hi << _U64(32)) | lo

    a = draw(num_hashes) | _U64(1)  # odd => bijection over Z/2^64
    b = draw(num_hashes)
    return a, b


def minhash_py(hashes: list[int], num_hashes: int, seed: int) -> list[int]:
    """Pure-Python oracle for the kernel (tests only)."""
    a, b = perm_params(num_hashes, seed)
    if not hashes:
        return [(1 << 62) + i for i in range(num_hashes)]
    out = []
    for i in range(num_hashes):
        m = min(((int(a[i]) * (h & 0xFFFFFFFFFFFFFFFF) + int(b[i])) & 0xFFFFFFFFFFFFFFFF) for h in hashes)
        out.append(m >> 1)
    return out


def minhash_signature_udf(num_hashes: int = 128, seed: int = 42):
    """pandas UDF: array<bigint> token hashes -> array<bigint> signature.

    Iterator form so (a, b) are built once per executor task, not per
    batch — mirrors the reference's batched GPU encode loop
    (/root/reference/blink/biencoder/data_process_mult.py:252-291).
    """
    a_params, b_params = perm_params(num_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        a = a_params[None, :]  # [1, P]
        b = b_params[None, :]
        empty = ((_U64(1) << _U64(62)) + np.arange(num_hashes, dtype=_U64)) >> _U64(1)
        empty = empty.astype(np.int64).tolist()
        for series in batches:
            out = []
            for hs in series:
                if hs is None or len(hs) == 0:
                    out.append(empty)
                    continue
                h = np.asarray(hs, dtype=np.int64).astype(_U64)[:, None]  # [n, 1]
                v = (h * a + b) & _MASK64  # wraps mod 2^64 (intended)
                sig = (v.min(axis=0) >> _U64(1)).astype(np.int64)
                out.append(sig.tolist())
            yield pd.Series(out)

    return _sig


# ------------------------------------------------ SQL-parity variant
#
# The production signature above uses xxhash64 (JVM-only). For the
# driver's DuckDB oracle we also provide a second, fully SQL-portable
# construction: token hash = first 60 bits of md5, permutations
# h -> (a_i*h + b_i) mod p over the prime field p = 2^31-1, with
# (a_i, b_i) themselves derived from md5 so BOTH engines can compute
# them inline. Same algorithm, portable primitives — the oracle then
# checks the whole MinHash+banding pipeline end-to-end.

PARITY_P = 2**31 - 1  # Mersenne prime; a*h < 2^62 fits BIGINT


def parity_perm_param(kind: str, i: int) -> int:
    """Deterministic 28-bit perm parameter from md5 — computable in
    DuckDB as ('0x' || substr(md5('<kind><i>'), 1, 7))::BIGINT."""
    import hashlib

    v = int(hashlib.md5(f"{kind}{i}".encode()).hexdigest()[:7], 16)
    return (v % (PARITY_P - 1)) + 1 if kind == "a" else v % PARITY_P


def parity_minhash_expr(tokens_sql_expr: str, num_hashes: int = 16) -> str:
    """Spark-SQL expr: array<string> tokens -> array<bigint> signature."""
    hashes = (
        f"transform(array_distinct({tokens_sql_expr}), "
        f"t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint) % {PARITY_P})"
    )
    slots = ", ".join(
        f"aggregate({hashes}, cast({PARITY_P} AS bigint), "
        f"(acc, h) -> least(acc, ({parity_perm_param('a', i)}L * h "
        f"+ {parity_perm_param('b', i)}L) % {PARITY_P}))"
        for i in range(num_hashes)
    )
    return f"array({slots})"


def parity_minhash_sql(tokens_sql_expr: str, num_hashes: int = 16) -> str:
    """DuckDB twin of parity_minhash_expr."""
    hashes = (
        f"list_transform(list_distinct({tokens_sql_expr}), "
        f"t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {PARITY_P})"
    )
    slots = ", ".join(
        f"coalesce(list_min(list_transform({hashes}, "
        f"h -> ({parity_perm_param('a', i)} * h "
        f"+ {parity_perm_param('b', i)}) % {PARITY_P})), {PARITY_P})"
        for i in range(num_hashes)
    )
    return f"[{slots}]"


def parity_band_key_expr(sig_expr: str, band: int, rows: int) -> str:
    """Spark-SQL band key: the band's signature slice as a string."""
    return (
        f"concat_ws('-', slice({sig_expr}, {band * rows + 1}, {rows}))"
    )


def parity_band_key_sql(sig_expr: str, band: int, rows: int) -> str:
    return (
        f"array_to_string(list_slice({sig_expr}, "
        f"{band * rows + 1}, {band * rows + rows}), '-')"
    )


def band_keys(sig_col: Column, bands: int, rows: int) -> Column:
    """array<bigint> of LSH band hashes (len == bands), JVM-side.

    Band j's key = xxhash64(sig[j*rows : (j+1)*rows], j) — two docs
    collide on band j iff that signature slice is identical.
    """
    return F.array(
        *[
            F.xxhash64(F.slice(sig_col, j * rows + 1, rows), F.lit(j))
            for j in range(bands)
        ]
    )
