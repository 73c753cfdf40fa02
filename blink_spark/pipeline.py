"""End-to-end entity-resolution pipeline (the flagship dataflow).

Mirrors the reference's flagship entry point
(/root/reference/blink/biencoder/eval_cluster_linking.py main():
tokenize -> embed+index -> kNN -> joint graph -> partition ->
connected components -> clusters -> metrics) as checkpointed Spark
stages:

  s0_normalized   id + sha256 invariant + tokens     (tokenize, X1 analog)
  s1_signatures   MinHash over content shingles      (embed, E1/E2 analog)
  s1_blocks       lang+LSH bands, salted hot blocks  (index+type partition, E6/E9)
  s2_pairs        blocked self-join                  (kNN retrieve, J1/J2)
  s2_scores       JW / Jaccard / TF-cosine blend     (cross-encoder rerank, E10)
  s2_edges        threshold + top-k per node         (F6 + T1/T2)
  s3_clusters     iterative connected components     (G6)

Every stage is a pure DataFrame -> DataFrame transform; ``run()``
orchestrates persistence through StageStore with resume-from-
checkpoint semantics (S4 analog) and writes lineage + metrics rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions import text
from blink_spark.functions.minhash import minhash_signature_udf
from blink_spark.functions.similarity import (
    jaro_winkler_udf,
    token_set_jaccard,
    tf_cosine_udf,
)
from blink_spark.io.tables import StageStore
from blink_spark.operators import blocking
from blink_spark.operators.connected_components import (
    CCStats,
    assign_clusters,
    connected_components,
)
from blink_spark.operators.pairs import attach_features, candidate_pairs, top_k_per_node


@dataclass
class ERConfig:
    # identity
    key_cols: tuple[str, ...] = ("repo", "path", "commit")
    lang_col: str = "lang"
    content_col: str = "content"
    path_col: str = "path"
    # stage 1 (recall knobs — the reference's nlist/nprobe analog)
    shingle_k: int = 5
    num_hashes: int = 128
    bands: int = 32
    rows_per_band: int = 4
    seed: int = 42
    pair_budget: int = 5_000_000
    # stage 2 (precision knobs)
    w_jw: float = 0.2
    w_jaccard: float = 0.4
    w_cosine: float = 0.4
    threshold: float = 0.45
    top_k: int | None = 20
    # stage 3
    cc_algorithm: str = "alternating"
    cc_max_iterations: int = 50


@dataclass
class ERResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    timings: dict[str, float] = field(default_factory=dict)
    metrics: dict[str, dict] = field(default_factory=dict)
    resumed: list[str] = field(default_factory=list)


class ERPipeline:
    def __init__(self, cfg: ERConfig | None = None):
        self.cfg = cfg or ERConfig()

    # ---------------------------------------------------------- stages
    def s0_normalize(self, files: DataFrame) -> DataFrame:
        c = self.cfg
        toks = text.tokenize(c.content_col)
        return files.select(
            text.stable_file_id(*c.key_cols).alias("file_id"),
            *[F.col(k) for k in c.key_cols if k != c.path_col],
            F.col(c.path_col),
            F.col(c.lang_col).alias("lang"),
            F.col(c.content_col).alias("content"),
            text.content_sha256(c.content_col).alias("sha256"),
            toks.alias("tokens"),
        ).withColumn("n_tokens", F.size("tokens"))

    def s1_signatures(self, s0: DataFrame) -> DataFrame:
        c = self.cfg
        sig_udf = minhash_signature_udf(c.num_hashes, c.seed)
        sh = text.shingles(F.col("tokens"), c.shingle_k)
        return s0.select(
            "file_id",
            "lang",
            F.col(self.cfg.path_col).alias("path"),
            "sha256",
            "tokens",
            sig_udf(text.token_hashes(sh)).alias("minhash"),
        )

    def s1_blocks(self, s1: DataFrame) -> DataFrame:
        c = self.cfg
        lsh = blocking.lsh_blocks(
            s1, "file_id", "lang", "minhash", c.bands, c.rows_per_band
        )
        exact = s1.select(
            blocking.exact_block_key(F.col("lang"), F.col("sha256")).alias("block_key"),
            "file_id",
        )
        return blocking.salt_hot_blocks(
            lsh.unionByName(exact), "file_id", c.pair_budget
        )

    def s2_pairs(self, blocks: DataFrame) -> DataFrame:
        return candidate_pairs(blocks, "file_id")

    def s2_scores(self, pairs: DataFrame, s1: DataFrame) -> DataFrame:
        c = self.cfg
        feat = attach_features(pairs, s1, "file_id", ["path", "sha256", "tokens"])
        jw = jaro_winkler_udf()(F.col("path_a"), F.col("path_b"))
        jac = token_set_jaccard(F.col("tokens_a"), F.col("tokens_b"))
        cos = tf_cosine_udf()(F.col("tokens_a"), F.col("tokens_b"))
        exact = F.col("sha256_a") == F.col("sha256_b")
        scored = feat.select(
            "id_a",
            "id_b",
            jw.alias("jw_path"),
            jac.alias("jaccard"),
            cos.alias("cosine"),
            exact.alias("is_exact"),
        )
        blend = (
            F.lit(c.w_jw) * F.col("jw_path")
            + F.lit(c.w_jaccard) * F.col("jaccard")
            + F.lit(c.w_cosine) * F.col("cosine")
        )
        return scored.withColumn(
            "score", F.when(F.col("is_exact"), F.lit(1.0)).otherwise(blend)
        )

    def s2_edges(self, scores: DataFrame) -> DataFrame:
        c = self.cfg
        edges = scores.where(F.col("score") >= c.threshold).select(
            "id_a", "id_b", "score"
        )
        if c.top_k:
            edges = top_k_per_node(edges, c.top_k)
        return edges

    def s3_clusters(self, edges: DataFrame, s0: DataFrame, stats: CCStats | None = None) -> DataFrame:
        comp = connected_components(
            edges.select("id_a", "id_b"),
            algorithm=self.cfg.cc_algorithm,
            max_iterations=self.cfg.cc_max_iterations,
            stats=stats,
        )
        return assign_clusters(s0.select("file_id"), comp, "file_id")

    # ------------------------------------------------------------- run
    def run(
        self,
        files: DataFrame,
        store: StageStore | None = None,
        resume: bool = True,
        until: str | None = None,
    ) -> ERResult:
        """Run all stages. With a store, each stage persists to its
        table and an existing table short-circuits recompute (the
        reference's pickle-memoization contract). Without a store,
        returns lazy DataFrames (caller materializes)."""
        res = ERResult()

        def stage(name: str, build, cache_no_store: bool = False) -> DataFrame:
            t0 = time.time()
            if store is not None and resume and store.exists(name):
                df = store.read(name)
                res.resumed.append(name)
            else:
                df = build()
                if store is not None:
                    store.write(df, name)
                    lin = store.write_lineage(store.read(name), name)
                    store.write_metrics(name, {"elapsed_sec": time.time() - t0, **lin})
                    df = store.read(name)
                elif cache_no_store:
                    df = df.localCheckpoint(eager=False)
            res.tables[name] = df
            res.timings[name] = time.time() - t0
            return df

        s0 = stage("s0_normalized", lambda: self.s0_normalize(files), True)
        s1 = stage("s1_signatures", lambda: self.s1_signatures(s0), True)
        blocks = stage("s1_blocks", lambda: self.s1_blocks(s1))
        if until == "block":
            return res
        pairs = stage("s2_pairs", lambda: self.s2_pairs(blocks))
        scores = stage("s2_scores", lambda: self.s2_scores(pairs, s1), True)
        edges = stage("s2_edges", lambda: self.s2_edges(scores))
        if until == "score":
            return res
        cc_stats = CCStats()
        clusters = stage("s3_clusters", lambda: self.s3_clusters(edges, s0, cc_stats))
        if cc_stats.iterations and store is not None:
            store.write_metrics(
                "s3_cc", {"algorithm": cc_stats.algorithm, "iterations": cc_stats.iterations}
            )
        res.metrics["cc"] = {
            "algorithm": cc_stats.algorithm,
            "iterations": cc_stats.iterations,
        }
        res.tables["clusters"] = clusters
        return res
