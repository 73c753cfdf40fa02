"""Stage-1 blocking: composite block keys + hot-block salting.

The analog of the reference's type-partitioned FAISS retrieval
(/root/reference/blink/biencoder/eval_cluster_linking.py:434-458,
501-524): `lang` plays `type` (search only within your own partition),
MinHash-LSH band keys play the IVF buckets
(/root/reference/blink/biencoder/data_process_mult.py:238-249).

Hot-block handling is ours alone (the reference OOMs on giant gold
clusters and approximates around them,
/root/reference/blink/biencoder/train_biencoder_mst.py:578-621): any
block whose pair count n·(n-1)/2 exceeds a budget is split by a
secondary salt so no single join task explodes. The salt is a
deterministic hash of (file_id, block_key), so different bands cut a
hot family at different boundaries and the union of bands still links
the family into one component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blink_spark.functions.minhash import band_keys


def exact_block_key(lang: Column, sha: Column) -> Column:
    """Degenerate blocking for exact duplicates: (lang, sha256)."""
    return F.concat_ws("|", F.lit("x"), lang, sha)


def lsh_blocks(
    df: DataFrame,
    id_col: str = "file_id",
    lang_col: str = "lang",
    sig_col: str = "minhash",
    bands: int = 16,
    rows: int = 8,
) -> DataFrame:
    """Explode LSH band keys -> (block_key, <id>). One row per (doc, band)."""
    bk = band_keys(F.col(sig_col), bands, rows)
    return (
        df.select(F.col(id_col), F.col(lang_col), F.posexplode(bk).alias("band", "bhash"))
        .select(
            F.concat_ws("|", F.col(lang_col), F.col("band"), F.col("bhash")).alias("block_key"),
            F.col(id_col),
        )
    )


def salt_hot_blocks(
    blocks: DataFrame,
    id_col: str = "file_id",
    pair_budget: int = 5_000_000,
    max_salts: int = 1024,
) -> DataFrame:
    """Split any block with > pair_budget pairs via secondary salting.

    Returns (block_key, <id>) with the salt folded into block_key.
    Block sizes come from one aggregation; the per-block salt count is
    ceil(n / rows_budget) where rows_budget keeps each salted
    sub-block under the pair budget. Small blocks pass through with
    salt 0 (key unchanged shape, so downstream is oblivious).
    """
    # rows_budget: n rows -> ~n^2/2 pairs; keep sub-block rows <= sqrt(2*budget)
    rows_budget = max(2, int((2 * pair_budget) ** 0.5))
    sizes = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
    nsalts = F.least(
        F.greatest(F.ceil(F.col("n") / rows_budget).cast("int"), F.lit(1)),
        F.lit(max_salts),
    )
    sized = blocks.join(
        F.broadcast(sizes.where(F.col("n") > rows_budget).withColumn("nsalts", nsalts)),
        "block_key",
        "left",
    )
    salt = F.when(
        F.col("nsalts").isNull(), F.lit(0)
    ).otherwise(F.pmod(F.xxhash64(F.col(id_col), F.col("block_key")), F.col("nsalts")).cast("int"))
    return sized.select(
        F.concat_ws("|", F.col("block_key"), salt).alias("block_key"),
        F.col(id_col),
    )


def salt_hot_blocks_numeric(
    blocks: DataFrame,
    id_col: str = "file_id",
    pair_budget: int = 5_000_000,
    max_salts: int = 1024,
) -> DataFrame:
    """salt_hot_blocks for NUMERIC (long) block keys: the salted key is
    xxhash64(block_key, salt); unsalted blocks keep their key. Numeric
    keys keep the block shuffle at 8 bytes/row and avoid JVM string
    building on the hot path (the pipeline's stage-1 path)."""
    rows_budget = max(2, int((2 * pair_budget) ** 0.5))
    sizes = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
    nsalts = F.least(
        F.greatest(F.ceil(F.col("n") / rows_budget).cast("int"), F.lit(1)),
        F.lit(max_salts),
    )
    sized = blocks.join(
        F.broadcast(sizes.where(F.col("n") > rows_budget).withColumn("nsalts", nsalts)),
        "block_key",
        "left",
    )
    salt = F.pmod(F.xxhash64(F.col(id_col), F.col("block_key")), F.col("nsalts"))
    salted_key = F.when(F.col("nsalts").isNull(), F.col("block_key")).otherwise(
        F.xxhash64(F.col("block_key"), salt)
    )
    return sized.select(salted_key.alias("block_key"), F.col(id_col))


def block_stats(blocks: DataFrame) -> DataFrame:
    """Per-block size + implied pair count (skew telemetry)."""
    return (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("n_pairs", (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("long"))
    )


def canopy_blocks(
    df: DataFrame,
    s_loose: float,
    s_tight: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int = 64,
    seed: int = 42,
    id_hash: str = "xxhash",
) -> DataFrame:
    """Canopy clustering as overlapping blocks (McCallum, Nigam & Ungar,
    KDD 2000) over an embedding column: cheap-similarity canopies whose
    OVERLAP is the point — near-misses that straddle a hard block
    boundary still share a canopy. In similarity terms: a point joins
    every canopy whose center it exceeds s_loose with; candidate centers
    within s_tight (> s_loose) of an accepted center are suppressed.

    Distributed adaptation: the original greedy consumes points
    sequentially — unrunnable and partition-dependent at scale — so the
    center pool is the repo's deterministic hash-min sample
    (n_candidates rows with smallest hash(id)), greedily suppressed in
    hash order on the driver (bounded: n_candidates rows), then
    broadcast; membership is one broadcast join + similarity filter.
    Points no surviving center covers become their own singleton canopy
    (cover-all guarantee). Deterministic at any parallelism.

    Returns (block_key, <id_col>) rows — one per (point, canopy) —
    feeding pairs.candidate_pairs like any other blocking.
    """
    if not s_tight > s_loose:
        raise ValueError("s_tight must exceed s_loose (tight ⊂ loose)")
    if n_candidates > _CANOPY_POOL_CAP:
        raise ValueError(
            f"canopy_blocks: n_candidates={n_candidates} exceeds the "
            f"driver-greedy pool cap {_CANOPY_POOL_CAP}; use "
            "canopy_blocks_distributed for pools that outgrow the driver"
        )
    pool = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            _canopy_hash(id_col, seed, id_hash).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(n_candidates)
        .collect()
    )
    centers = _suppress_greedy(
        [(r["cid"], r["cvec"]) for r in pool], [], s_tight
    )
    return _canopy_membership(df, centers, s_loose, id_col, vec_col)


_CANOPY_POOL_CAP = 100_000  # rows a single driver collect may hold


def _canopy_hash(id_col: str, seed: int, id_hash: str):
    if id_hash == "md5":
        from blink_spark.functions.parityhash import md5_prefix_hash64

        return md5_prefix_hash64(id_col)
    return F.xxhash64(F.col(id_col), F.lit(seed))


def _suppress_greedy(
    pool: list, accepted: list, s_tight: float
) -> list:
    """Sequential McCallum suppression over `pool` (id, vec) rows in
    order, seeded with already-`accepted` (id, vec, norm) centers: a
    candidate survives iff no earlier-accepted center exceeds s_tight.
    Returns the extended accepted list."""
    import numpy as np

    out = list(accepted)
    for cid, cvec in pool:
        v = np.asarray(cvec, dtype=np.float64)
        nv = np.linalg.norm(v)
        suppressed = False
        for _, cv, cnv in out:
            denom = nv * cnv
            sim = float(v @ cv / denom) if denom > 0 else 0.0
            if sim > s_tight:
                suppressed = True
                break
        if not suppressed:
            out.append((cid, v, nv))
    return out


def _canopy_membership(
    df: DataFrame, centers: list, s_loose: float, id_col: str, vec_col: str
) -> DataFrame:
    """Broadcast the accepted centers (typed by the ACTUAL id column —
    string ids work) and emit (block_key, id) membership + singleton
    fallback rows."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    from blink_spark.functions.similarity import array_cosine

    spark = df.sparkSession
    schema = StructType(
        [
            StructField("canopy_id", df.schema[id_col].dataType),
            StructField("cvec", ArrayType(DoubleType())),
        ]
    )
    cdf = F.broadcast(
        spark.createDataFrame(
            [(cid, [float(x) for x in cv]) for cid, cv, _ in centers], schema
        )
    )
    member = (
        df.select(F.col(id_col), F.col(vec_col))
        .crossJoin(cdf)
        .where(array_cosine(F.col(vec_col), F.col("cvec")) > F.lit(s_loose))
        .select(
            F.concat_ws("|", F.lit("c"), F.col("canopy_id")).alias("block_key"),
            F.col(id_col),
        )
    )
    covered = member.select(id_col).distinct()
    singletons = (
        df.select(F.col(id_col))
        .join(covered, id_col, "left_anti")
        .select(
            F.concat_ws("|", F.lit("s"), F.col(id_col)).alias("block_key"),
            F.col(id_col),
        )
    )
    return member.unionByName(singletons)


def canopy_blocks_distributed(
    df: DataFrame,
    s_loose: float,
    s_tight: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int = 64,
    seed: int = 42,
    id_hash: str = "xxhash",
    batch_size: int = 1024,
) -> DataFrame:
    """`canopy_blocks` for center pools that outgrow a single driver
    collect: the same deterministic hash-ordered greedy suppression,
    consumed in bounded batches with broadcast tight-radius anti-join
    rounds between them.

    Per round: collect the next `batch_size` candidates in (hash, id)
    order (bounded driver memory), run the sequential suppression
    seeded with every center accepted so far, then prune the remaining
    candidate pool IN SPARK — drop rows within s_tight of any center
    accepted this round (they would be suppressed later anyway, so the
    prune is semantics-preserving) — and spill the survivors to scratch
    parquet (durable checkpoint: the iterative-path discipline). The
    result is EXACTLY the sequential greedy over the full pool, so on
    small pools this equals `canopy_blocks` (pytest-gated; the only
    divergence risk is a candidate whose cosine sits within 1 ulp of
    s_tight across the numpy / JVM kernels).

    Accepted centers must still fit a broadcast — inherent to canopy
    membership itself, not to the suppression."""
    import os

    from blink_spark.functions.similarity import array_cosine
    from blink_spark.io.scratch import release, scratch_dir, spill

    if not s_tight > s_loose:
        raise ValueError("s_tight must exceed s_loose (tight ⊂ loose)")
    pool = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            _canopy_hash(id_col, seed, id_hash).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(n_candidates)
    )
    d = scratch_dir()
    remaining = spill(pool, os.path.join(d, "round_0"))
    spark = df.sparkSession
    accepted: list = []
    rnd = 0
    while True:
        batch = remaining.orderBy("h", "cid").limit(batch_size).collect()
        n_before = len(accepted)
        accepted = _suppress_greedy(
            [(r["cid"], r["cvec"]) for r in batch], accepted, s_tight
        )
        if len(batch) < batch_size:
            break
        last = batch[-1]
        rnd += 1
        nxt = remaining.where(
            (F.col("h") > F.lit(last["h"]))
            | ((F.col("h") == F.lit(last["h"])) & (F.col("cid") > F.lit(last["cid"])))
        )
        new_vecs = [[float(x) for x in cv] for _, cv, _ in accepted[n_before:]]
        if new_vecs:
            nc = F.broadcast(
                spark.createDataFrame(
                    [(v,) for v in new_vecs], "ncvec array<double>"
                )
            )
            supp = (
                nxt.crossJoin(nc)
                .where(array_cosine(F.col("cvec"), F.col("ncvec")) > F.lit(s_tight))
                .select("cid")
                .distinct()
            )
            nxt = nxt.join(supp, "cid", "left_anti")
        remaining = spill(nxt, os.path.join(d, f"round_{rnd}"))
    release(d)
    return _canopy_membership(df, accepted, s_loose, id_col, vec_col)
