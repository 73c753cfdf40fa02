"""Benchmark harness — prints ONE JSON line for the driver.

Headline workload:
  * er_e2e        flagship ER pipeline (block -> score -> CC) on the
                  deterministic synthetic repo corpus; reports
                  scored-pairs/sec (the BASELINE.json north metric)
  * a representative slice of the driver-contract queries at
    $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Each query is materialized with the noop sink (full execution, no
write cost). Environment knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
(default 32), BENCH_ENTITIES (corpus size for er_e2e).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_entities = int(os.environ.get("BENCH_ENTITIES", "2000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entry_mod
    from blink_spark.corpus import generate_files
    from blink_spark.pipeline import ERConfig, ERPipeline
    from blink_spark.session import get_spark

    spark = get_spark("blink_spark.bench", cores=cpus)
    timings: dict[str, float] = {}

    # -- flagship ER pipeline on the synthetic corpus ------------------
    files = generate_files(spark, n_entities=n_entities, hot_family_size=200)
    files = files.localCheckpoint(eager=True)  # exclude datagen from timing
    pipe = ERPipeline(ERConfig())
    t0 = time.time()
    res = pipe.run(files)
    n_scored = res.tables["s2_scores"].count()
    n_clusters = res.tables["s3_clusters"].select("cluster_id").distinct().count()
    er_sec = time.time() - t0
    timings["er_e2e"] = round(er_sec, 3)

    # -- driver-contract headline queries ------------------------------
    qs = entry_mod.queries()
    headline = [
        "rel_agg_q1",
        "rel_topk_window",
        "rel_join_dims",
        "er_lsh_band_pairs",
        "er_pair_scores",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "ann_cosine_topk",
        "text_quality",
        "mm_byte_features",
    ]
    for name in headline:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cpus,
        "er_scored_pairs": int(n_scored),
        "er_clusters": int(n_clusters),
        "er_pairs_per_sec": round(n_scored / er_sec, 1) if er_sec else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
