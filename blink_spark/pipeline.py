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
from blink_spark.functions.minhash import content_signature_features_udf
from blink_spark.functions.similarity import presorted_pair_scores_udf
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
    # caps any single block's pair count (~sqrt(2B) rows/block): the
    # worst-case join task is the pipeline's serial floor, so keep it
    # seconds-sized; recall across salt boundaries is preserved by the
    # other bands (independent salt cuts), the exact-sha block, and CC
    # transitivity
    pair_budget: int = 100_000
    # stage 2 (precision knobs)
    w_jw: float = 0.2
    w_jaccard: float = 0.4
    w_cosine: float = 0.4
    threshold: float = 0.45
    # per-node top-k edge pruning is OFF by default: in a clone family
    # any variant subgroup larger than k out-scores its bridge edges on
    # BOTH endpoints and disconnects (measured: a 1000-file family's
    # 166 license-header variants split off at k=20 AND k=60, recall
    # 0.73). The reference avoids this with entity-constrained
    # partitioning (special_partition.pyx:288-356); in pure dedup the
    # equivalent is threshold-only edges + CC. top_k remains available
    # as the T1/T2 ladder knob for recall-bounded retrieval use.
    top_k: int | None = None
    # stage 3
    cc_algorithm: str = "alternating"
    cc_max_iterations: int = 50
    # "cc": plain connected components (pure dedup). "entity": G4
    # entity-constrained partition — requires run(entities=catalogue);
    # the opt-in that makes top_k safe (each cluster anchors to exactly
    # one entity, so per-node edge pruning can no longer fracture a
    # family; reference special_partition.pyx:288-356)
    partition: str = "cc"


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
        # no tokenization here: token arrays in the s0 checkpoint cost
        # GBs of string storage, and JVM regex tokenization does not
        # scale across task threads — all token work happens in s1's
        # fused Python kernel
        return files.select(
            text.stable_file_id(*c.key_cols).alias("file_id"),
            *[F.col(k) for k in c.key_cols if k != c.path_col],
            F.col(c.path_col),
            F.col(c.lang_col).alias("lang"),
            F.col(c.content_col).alias("content"),
            text.content_sha256(c.content_col).alias("sha256"),
        )

    def s1_signatures(self, s0: DataFrame) -> DataFrame:
        c = self.cfg
        # ONE fused Arrow pass over content: tokenize (python re —
        # java regex does not scale across local task threads), hash,
        # numeric k-gram shingling, MinHash, and the stage-2 scoring
        # features (sorted unique hashes + counts + TF norm). No token
        # strings ever cross a shuffle.
        feat_udf = content_signature_features_udf(
            c.num_hashes,
            c.seed,
            shingle_k=c.shingle_k,
            bands=c.bands,
            rows_per_band=c.rows_per_band,
        )
        return (
            s0.select(
                "file_id",
                "lang",
                F.col(self.cfg.path_col).alias("path"),
                "sha256",
                feat_udf(F.col("content"), F.col("lang")).alias("ft"),
            )
            .select(
                "file_id",
                "lang",
                "path",
                "sha256",
                F.col("ft.bands").alias("bands"),
                F.col("ft.tu").alias("tu"),
                F.col("ft.tc").alias("tc"),
                F.col("ft.tnorm").alias("tnorm"),
                F.col("ft.n_tokens").alias("n_tokens"),
            )
        )

    def s1_blocks(self, s1: DataFrame) -> DataFrame:
        c = self.cfg
        # band keys were already computed (lang folded in) by the s1
        # kernel — blocking is a pure explode + numeric-key union here
        lsh = s1.select("file_id", F.explode("bands").alias("block_key"))
        exact = s1.select(
            F.xxhash64(F.lit("x"), F.col("lang"), F.col("sha256")).alias("block_key"),
            "file_id",
        )
        return blocking.salt_hot_blocks_numeric(
            lsh.unionByName(exact), "file_id", c.pair_budget
        )

    def s2_pairs(self, blocks: DataFrame) -> DataFrame:
        return candidate_pairs(blocks, "file_id")

    def s2_scores(self, pairs: DataFrame, s1: DataFrame) -> DataFrame:
        c = self.cfg
        feat = attach_features(
            pairs, s1, "file_id", ["path", "sha256", "tu", "tc", "tnorm"]
        )
        # single fused numpy kernel (JW + jaccard + cosine) over
        # pre-aggregated per-file features: merge-intersect + dot per
        # pair, norms precomputed in s1, one worker chain per task
        sc = presorted_pair_scores_udf()(
            F.col("path_a"), F.col("path_b"),
            F.col("tu_a"), F.col("tc_a"), F.col("tnorm_a"),
            F.col("tu_b"), F.col("tc_b"), F.col("tnorm_b"),
        )
        exact = F.col("sha256_a") == F.col("sha256_b")
        scored = feat.select(
            "id_a",
            "id_b",
            sc.alias("sc"),
            exact.alias("is_exact"),
        ).select(
            "id_a",
            "id_b",
            F.col("sc.jw").alias("jw_path"),
            F.col("sc.jaccard").alias("jaccard"),
            F.col("sc.cosine").alias("cosine"),
            "is_exact",
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

    def s3_clusters(
        self,
        edges: DataFrame,
        s0: DataFrame,
        stats: CCStats | None = None,
        checkpoint_fn=None,
    ) -> DataFrame:
        comp = connected_components(
            edges.select("id_a", "id_b"),
            algorithm=self.cfg.cc_algorithm,
            max_iterations=self.cfg.cc_max_iterations,
            stats=stats,
            checkpoint_fn=checkpoint_fn,
        )
        return assign_clusters(s0.select("file_id"), comp, "file_id")

    def _s3_entity_partition(
        self, scores: DataFrame, mentions: DataFrame, entities: DataFrame
    ) -> DataFrame:
        """G4 stage-3: per-mention best-entity edge + top-k mention
        edges, resolved by the entity-constrained partition; cluster_id
        is the anchoring entity's file_id (mentions that reach no
        entity stay singletons). See blink_spark.linking for the
        full two-table API."""
        from blink_spark.linking import LinkPipeline, flag_entity_endpoints
        from blink_spark.operators.linking import entity_constrained_partition

        ent_ids = self.s0_normalize(entities).select("file_id").distinct()
        men_ids = self.s0_normalize(mentions).select("file_id").distinct()
        flagged = flag_entity_endpoints(
            scores.select("id_a", "id_b", "score"), ent_ids
        )
        lp = LinkPipeline(self.cfg, mention_knn=self.cfg.top_k or 4)
        part = entity_constrained_partition(lp.joint_graph(flagged))
        pred = men_ids.join(
            part.where(~F.col("is_entity")).select(
                F.col("node_id").alias("file_id"),
                F.col("entity_id").alias("pred_entity_id"),
            ),
            "file_id",
            "left",
        )
        return pred.select(
            "file_id",
            F.coalesce("pred_entity_id", F.col("file_id")).alias("cluster_id"),
        )

    # ------------------------------------------------------------- run
    def run(
        self,
        files: DataFrame,
        store: StageStore | None = None,
        resume: bool = True,
        until: str | None = None,
        scratch_dir: str | None = None,
        entities: DataFrame | None = None,
    ) -> ERResult:
        """Run all stages. With a store, each stage persists to its
        table and an existing table short-circuits recompute (the
        reference's pickle-memoization contract). Without a store,
        stages form one lazy plan, except multi-consumer tables (s1,
        edges) which spill to scratch parquet — measured here, both
        localCheckpoint and the columnar cache burn far more CPU than
        a parquet round-trip for these shapes, and parquet is the same
        mechanism the durable store uses anyway."""
        from blink_spark.io import scratch as _scratch

        use_entity = self.cfg.partition == "entity"
        if use_entity and entities is None:
            raise ValueError(
                "partition='entity' requires run(entities=<catalogue DataFrame>)"
            )
        mentions_only = files
        if use_entity:
            # catalogue rows flow through the same s0-s2 stages; s3
            # splits edges by endpoint kind and anchors clusters
            files = files.unionByName(
                entities.select(*mentions_only.columns)
            )
        res = ERResult()
        if store is None and scratch_dir is None:
            # registered for cleanup at interpreter exit (bench loops
            # previously leaked one mkdtemp per run)
            scratch_dir = _scratch.scratch_dir()

        def spill(df: DataFrame, name: str) -> DataFrame:
            return _scratch.spill(df, f"{scratch_dir}/{name}")

        # columns each stage's consumers depend on: a store written by
        # an older layout short-circuits resume only if these exist,
        # otherwise the stage silently recomputes (schema-versioning
        # guard for resume-across-code-versions)
        required = {
            "s0_normalized": {"file_id", "sha256", "lang", "content"},
            "s1_signatures": {"file_id", "bands", "tu", "tc", "tnorm", "sha256"},
            "s1_blocks": {"block_key", "file_id"},
            "s2_pairs": {"id_a", "id_b"},
            "s2_scores": {"id_a", "id_b", "score"},
            "s2_edges": {"id_a", "id_b", "score"},
            "s3_clusters": {"file_id", "cluster_id"},
        }

        def _resumable(name: str) -> bool:
            if store is None or not resume or not store.exists(name):
                return False
            have = set(store.read(name).columns)
            return required.get(name, set()) <= have

        def stage(
            name: str, build, spill_no_store: bool = False
        ) -> DataFrame:
            t0 = time.time()
            if _resumable(name):
                df = store.read(name)
                res.resumed.append(name)
            else:
                df = build()
                if store is not None:
                    store.write(df, name)
                    lin = store.write_lineage(store.read(name), name)
                    store.write_metrics(name, {"elapsed_sec": time.time() - t0, **lin})
                    df = store.read(name)
                elif spill_no_store:
                    df = spill(df, name)
            res.tables[name] = df
            res.timings[name] = time.time() - t0
            return df

        s0 = stage("s0_normalized", lambda: self.s0_normalize(files))
        s1 = stage("s1_signatures", lambda: self.s1_signatures(s0), True)
        blocks = stage("s1_blocks", lambda: self.s1_blocks(s1))
        if until == "block":
            return res
        pairs = stage("s2_pairs", lambda: self.s2_pairs(blocks))
        scores = stage("s2_scores", lambda: self.s2_scores(pairs, s1), True)
        edges = stage("s2_edges", lambda: self.s2_edges(scores), True)
        if until == "score":
            return res
        cc_stats = CCStats()
        from blink_spark.operators.connected_components import make_parquet_checkpointer

        cc_dir = (
            store.fs_scratch_path("_cc_scratch")
            if store is not None
            else f"{scratch_dir}/cc"
        )
        if cc_dir is None:  # catalog-table store: CC scratch goes to temp
            cc_dir = f"{_scratch.scratch_dir()}/cc"
        cc_ckpt = make_parquet_checkpointer(cc_dir)
        if use_entity:
            clusters = stage(
                "s3_clusters",
                lambda: self._s3_entity_partition(scores, mentions_only, entities),
            )
        else:
            clusters = stage(
                "s3_clusters", lambda: self.s3_clusters(edges, s0, cc_stats, cc_ckpt)
            )
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
