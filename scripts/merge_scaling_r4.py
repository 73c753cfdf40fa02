"""Merge the round-4 two-pair scaling runs into SCALING.json.

Reads the child/summary JSON lines from the two scaling_bench.py runs
(levels 1-4 and 2-8 on the shared /tmp/scale_corpus_r4 parquet) and
rewrites SCALING.json in the round-3 format with measured_round: 4.
Round-3 sensitivity/ceiling blocks are carried forward verbatim (they
characterize the methodology, not this VM) with their round noted.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, dict, dict]:
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    children = {r["cores"]: r for r in rows if "cores" in r}
    summary = [r for r in rows if "scaling_efficiency" in r][-1]
    return children, summary, rows[-1]


def main() -> int:
    c14, s14, _ = load("/tmp/scaling_r4_14.out")
    c28, s28, _ = load("/tmp/scaling_r4_28.out")
    children = {**c14, **c28}
    prev = json.load(open("SCALING.json"))

    checksums = {k: v["cluster_checksum"] for k, v in children.items()}
    identical = len(set(checksums.values())) == 1

    out = {
        "what": prev["what"].replace("round 3", "round 4"),
        "headline": {
            "levels": s14["levels"],
            "scaling_efficiency": s14["scaling_efficiency"],
            "speedup": s14["speedup"],
            "meets_0.8_target": s14["scaling_efficiency"] >= 0.8,
            "second_pair": {
                "levels": s28["levels"],
                "scaling_efficiency": s28["scaling_efficiency"],
                "speedup": s28["speedup"],
                "meets_0.8_target": s28["scaling_efficiency"] >= 0.8,
            },
        },
        "corpus": {
            "n_files": children[1]["n_files"],
            "scored_pairs": children[1]["scored_pairs"],
            "gen": prev["corpus"]["gen"],
        },
        "levels": {
            str(k): {
                "wall_sec": v["wall_sec"],
                "pairs_per_sec": v["pairs_per_sec"],
                "files_per_sec": v["files_per_sec"],
                "stage_secs": v["stage_secs"],
            }
            for k, v in sorted(children.items())
        },
        "per_stage_speedup_1_to_4": {
            st: round(
                children[1]["stage_secs"][st] / children[4]["stage_secs"][st], 2
            )
            for st in ("s1_signatures", "s2_scores", "s3_clusters")
        },
        "clusters_identical_all_levels": identical,
        "levels_checked_for_identity": sorted(children),
        "cluster_checksum": checksums[1],
        "cross_host_determinism": (
            "round-4 VM reproduces the corpus-spec checksum at every "
            "parallelism level; prior rounds measured "
            + prev["cluster_checksum"]
            + " for the same spec on three other hosts"
            if checksums[1] == prev["cluster_checksum"]
            else "CHECKSUM CHANGED vs round 3 — investigate before shipping"
        ),
        "amdahl_fit": {
            "serial_sec": s14["amdahl_serial_sec"],
            "parallel_core_sec": s14["amdahl_parallel_sec"],
            "serial_fraction_at_1core": round(
                s14["amdahl_serial_sec"]
                / (s14["amdahl_serial_sec"] + s14["amdahl_parallel_sec"]),
                4,
            ),
        },
        "sensitivity_smaller_corpus": {
            **prev["sensitivity_smaller_corpus"],
            "measured_round": 3,
        },
        "measurement_hygiene": prev["measurement_hygiene"],
        "reproduce": prev["reproduce"].replace("DIR", "/tmp/scale_corpus_r4"),
        "host": "32-vCPU VM (round-4 host), single JVM local mode; "
        "single-thread calib_sec ~0.555 (see BENCH_r04_early.json)",
        "measured_round": 4,
        "prior_rounds": {
            "3": {"eff_1_to_4": 0.991, "eff_2_to_8": 0.843},
            "2": {"eff_1_to_4": 0.932},
        },
    }
    json.dump(out, open("SCALING.json", "w"), indent=1)
    print(json.dumps(out["headline"]))
    print("checksum_match_r3:", checksums[1] == prev["cluster_checksum"])
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
