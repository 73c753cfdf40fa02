"""Entity-constrained graph partition (G4) — the reference's
``special_partition`` re-expressed for Spark.

The reference partitions its joint mention/entity graph by dropping
edges in ascending weight order, keeping an edge only if dropping it
would disconnect the edge's source from every entity
(/root/reference/blink/biencoder/special_partition/special_partition.pyx:288-356,
invoked from eval_cluster_linking.py:105-139). The resulting directed
graph has out-degree exactly one per mention, i.e. it is a forest of
in-trees each rooted at exactly one entity — which is precisely the
invariant the reference asserts downstream (clusters contain one and
only one entity, eval_cluster_linking.py:233-235).

Spark shape: the joint graph's weakly-connected components are found
with the distributed CC operator; each component is then partitioned
independently inside one ``applyInPandas`` group (components are
block-bounded — the blocking pair budget caps how much of the corpus
can transitively connect, so a component fits one task; this mirrors
the reference running the Cython kernel over one adjacency at a time).
The greedy itself is implemented from its public description: ascending
edge scan + reachability check, with (score, src, dst) tie-breaks so
the result is deterministic at any parallelism.
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from blink_spark.operators.connected_components import connected_components

PARTITION_SCHEMA = "node_id long, is_entity boolean, entity_id long"


def entity_reachable_nodes(
    edges: Iterable[tuple[int, int]], entities: set[int]
) -> set[int]:
    """Nodes from which >= 1 entity is reachable along directed edges
    (computed as a reverse BFS from the entity set)."""
    rev: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        rev[d].append(s)
    seen = set(entities)
    queue = deque(entities)
    while queue:
        n = queue.popleft()
        for p in rev.get(n, ()):
            if p not in seen:
                seen.add(p)
                queue.append(p)
    return seen


def special_partition_py(
    edges: list[tuple[int, int, float]], entities: set[int]
) -> list[tuple[int, int, float]]:
    """Greedy entity-constrained partition of ONE component.

    edges are directed (src, dst, score); every src is expected to
    reach an entity (filter with entity_reachable_nodes first). Scans
    edges in ascending (score, src, dst) order; an edge is dropped iff
    its source can still reach an entity without it. Result: each
    surviving source has exactly one outgoing edge and each weak
    component of the kept graph contains exactly one entity.

    Same asymptotics as the reference kernel (one reachability walk
    per edge, special_partition.pyx:288-356); fine for block-bounded
    components, which is the only place it runs.

    Duplicate (src, dst) rows are deduped to their max weight first —
    the reference's preprocessing drops duplicates the same way
    (special_partition.pyx:385 'Duplicates' counter); without it a
    transductive pin that coincides with the best-entity edge would
    survive as out-degree 2 (found by hypothesis).
    """
    best_w: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        key = (s, d)
        if key not in best_w or w > best_w[key]:
            best_w[key] = w
    edges = [(s, d, w) for (s, d), w in best_w.items()]
    out_adj: dict[int, set[int]] = defaultdict(set)
    for s, d, _ in edges:
        out_adj[s].add(d)

    def reaches_entity(start: int) -> bool:
        if start in entities:
            return True
        seen = {start}
        queue = deque([start])
        while queue:
            n = queue.popleft()
            for d in out_adj.get(n, ()):
                if d in entities:
                    return True
                if d not in seen:
                    seen.add(d)
                    queue.append(d)
        return False

    kept: list[tuple[int, int, float]] = []
    for s, d, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        out_adj[s].discard(d)
        if reaches_entity(s):
            continue  # redundant edge: stays dropped
        out_adj[s].add(d)
        kept.append((s, d, w))
    return kept


def assign_entities_py(
    kept: list[tuple[int, int, float]], entities: set[int]
) -> dict[int, int]:
    """Follow each node's (unique) kept out-edge chain to its root
    entity. Returns {node: entity} for all chain-connected nodes."""
    nxt: dict[int, tuple[float, int]] = {}
    for s, d, w in kept:
        cur = nxt.get(s)
        # out-degree should be exactly 1; deterministic pick if not
        if cur is None or (-w, d) < cur:
            nxt[s] = (-w, d)
    assign: dict[int, int] = {e: e for e in entities}

    def resolve(n: int) -> int | None:
        path = []
        on_path = set()
        while n not in assign:
            step = nxt.get(n)
            if step is None or n in on_path:  # dead end / defensive cycle guard
                break
            path.append(n)
            on_path.add(n)
            n = step[1]
        root = assign.get(n)
        if root is not None:
            for p in path:
                assign[p] = root
        return root

    for s in list(nxt):
        resolve(s)
    return assign


def _partition_one_component(pdf: pd.DataFrame, undirected: bool = False) -> pd.DataFrame:
    nodes: dict[int, bool] = {}
    for col_id, col_flag in (("src", "src_is_entity"), ("dst", "dst_is_entity")):
        for nid, flag in zip(pdf[col_id], pdf[col_flag]):
            nodes[int(nid)] = bool(flag) or nodes.get(int(nid), False)
    entities = {n for n, f in nodes.items() if f}
    all_edges = [
        (int(s), int(d), float(w))
        for s, d, w in zip(pdf["src"], pdf["dst"], pdf["score"])
    ]
    if undirected:
        # G3 (reference undirected mode): filter to the max spanning
        # forest, then restore BOTH directions before the greedy
        # (special_partition.pyx:391-414 — scipy MST on negated
        # weights + "Add the reverse edges").
        from blink_spark.operators.mst import max_spanning_forest_py

        forest = max_spanning_forest_py(all_edges)
        all_edges = [(s, d, w) for s, d, w in forest] + [
            (d, s, w) for s, d, w in forest
        ]
    if entities:
        ok = entity_reachable_nodes([(s, d) for s, d, _ in all_edges], entities)
        live = [
            (s, d, w) for s, d, w in all_edges if s in ok and d in ok
        ]
        assign = assign_entities_py(special_partition_py(live, entities), entities)
    else:
        assign = {}
    rows = [
        {"node_id": n, "is_entity": f, "entity_id": assign.get(n)}
        for n, f in sorted(nodes.items())
    ]
    return pd.DataFrame(rows, columns=["node_id", "is_entity", "entity_id"])


def _star_window_assign(star: DataFrame, undirected: bool) -> DataFrame:
    """Resolve entity-star-only components (every edge mention->entity)
    with pure DataFrame ops — no pandas group ever holds a component.

    Equivalence to the greedy (exact, including tie-breaks): a mention
    whose out-edges all terminate at entity nodes has depth-1
    reachability, so during the ascending (score, src, dst) scan each
    of its edges except the LAST is dropped (the not-yet-processed
    rest still reaches an entity) and the last — max score, then max
    dst — is kept. That is a per-src window argmax. Duplicate
    (src, dst) rows need no explicit dedup: the argmax picks the same
    row the dedup-to-max-weight would.

    undirected mode first G3-filters to the max spanning forest
    (special_partition.pyx:391-414) — ties across 4-cycles make the
    forest's kept-edge set differ from the raw argmax, so the fast
    path runs the DISTRIBUTED Boruvka forest (tie-identical to the
    per-component Kruskal, pinned by tests) and argmaxes over forest
    edges. Entities keep >= 1 edge per mention (a spanning forest
    never isolates a node), so every mention still resolves.
    """
    ents = star.select(F.col("dst").alias("node_id")).distinct()
    edges_me = star.select("src", "dst", "score")
    if undirected:
        from blink_spark.operators.mst import max_spanning_forest

        forest = max_spanning_forest(edges_me)
        # canonical min-first endpoints -> back to (mention, entity)
        flagged = forest.join(
            ents.select(F.col("node_id").alias("src")).withColumn(
                "src_is_ent", F.lit(True)
            ),
            "src",
            "left",
        )
        edges_me = flagged.select(
            F.when(F.col("src_is_ent"), F.col("dst")).otherwise(F.col("src")).alias("src"),
            F.when(F.col("src_is_ent"), F.col("src")).otherwise(F.col("dst")).alias("dst"),
            "score",
        )
    w = W.partitionBy("src").orderBy(F.desc("score"), F.desc("dst"))
    mentions = (
        edges_me.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("src").alias("node_id"),
            F.lit(False).alias("is_entity"),
            F.col("dst").alias("entity_id"),
        )
    )
    entities = ents.select(
        "node_id", F.lit(True).alias("is_entity"), F.col("node_id").alias("entity_id")
    )
    return mentions.unionByName(entities)


def _salvage_assign(part: DataFrame) -> DataFrame:
    """Degraded resolution for oversize mixed components: every mention
    takes its best retrieved entity edge directly (the star argmax,
    ignoring mention-mention edges); mentions with no entity edge stay
    NULL. Loses the greedy's chain-healing, keeps the one-entity-per-
    cluster invariant, and never concentrates a component in one task."""
    nodes = (
        part.select(F.col("src").alias("node_id"), F.col("src_is_entity").alias("is_ent"))
        .unionByName(
            part.select(F.col("dst").alias("node_id"), F.col("dst_is_entity").alias("is_ent"))
        )
        .groupBy("node_id")
        .agg(F.max("is_ent").alias("is_entity"))
    )
    me = part.where(~F.col("src_is_entity") & F.col("dst_is_entity"))
    w = W.partitionBy("src").orderBy(F.desc("score"), F.desc("dst"))
    best = (
        me.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("src").alias("node_id"), F.col("dst").alias("best_ent"))
    )
    return nodes.join(best, "node_id", "left").select(
        "node_id",
        "is_entity",
        F.when(F.col("is_entity"), F.col("node_id"))
        .otherwise(F.col("best_ent"))
        .alias("entity_id"),
    )


def _route_components(
    edges: DataFrame, max_component_edges: int
) -> tuple[DataFrame, DataFrame, F.Column]:
    """Weak components + per-component shape stats + the G4 route
    decision. Returns (e, stats, route): e = the durably spilled edge
    table with its component id (consumed by every routed path), stats
    = (component, not_star, n_edges) spilled, route = the decision
    Column over stats — 'star' (entity-star only), 'over' (mixed past
    the edge budget), else 'greedy'. Shared by the partition itself and
    by g4_route_stats so the exported stats can never drift from what
    the router actually does."""
    from blink_spark.io.scratch import spill_scratch

    sym = edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    comp = connected_components(sym)
    e = edges.join(comp.select(F.col("id").alias("src"), "component"), "src")
    e, _ = spill_scratch(e, "g4_edges")
    stats = e.groupBy("component").agg(
        F.max(
            (F.col("src_is_entity") | ~F.col("dst_is_entity")).cast("int")
        ).alias("not_star"),
        F.count(F.lit(1)).alias("n_edges"),
    )
    stats, _ = spill_scratch(stats, "g4_stats")
    big = F.col("n_edges") > F.lit(int(max_component_edges))
    route = (
        F.when(F.col("not_star") == 0, F.lit("star"))
        .when(big, F.lit("over"))
        .otherwise(F.lit("greedy"))
    )
    return e, stats, route


def g4_route_stats(
    edges: DataFrame, max_component_edges: int = 2_000_000
) -> DataFrame:
    """Router decision table for G4: (route, n_components, n_edges) at
    the given edge budget — how many weak components would take the
    star argmax, the per-component greedy, or the oversize path. Runs
    the SAME CC + shape stats the partition itself routes on (shared
    `_route_components`), so a driver value-oracle over a fixture with
    a known split catches silent ROUTING drift, not just final-answer
    drift (round-4 VERDICT item 6). Cheap relative to the partition:
    stops after the stats aggregation."""
    _, stats, route = _route_components(edges, max_component_edges)
    return stats.groupBy(route.alias("route")).agg(
        F.count(F.lit(1)).alias("n_components"),
        F.sum("n_edges").alias("n_edges"),
    )


def entity_constrained_partition(
    edges: DataFrame,
    undirected: bool = False,
    max_component_edges: int = 2_000_000,
    oversize: str = "error",
) -> DataFrame:
    """Distributed G4: edges(src, dst, score, src_is_entity,
    dst_is_entity) -> (node_id, is_entity, entity_id) for every node
    in the graph. entity_id is NULL for mentions that cannot reach any
    entity (the reference never sees these — its kNN always returns
    entity candidates; blocking-based retrieval can come up empty).

    CC finds the weak components (O(log n) distributed rounds); each
    component is then routed by shape:

    * **entity-star-only** (no mention-mention edge, no entity-sourced
      edge — the mention_knn=0 rung, and the HOT-ENTITY skew shape: a
      popular catalogue entity pulls all its mentions into one
      component) -> pure window argmax, never a pandas group. A
      10^8-mention star is just a shuffle on src.
    * **mixed** components up to ``max_component_edges`` -> the exact
      per-component ``applyInPandas`` greedy (one task per component,
      components in parallel — mirrors the reference running the
      Cython kernel per adjacency, special_partition.pyx:288-356).
    * **mixed oversize** -> ``oversize="error"`` (default) raises with
      the offending component sizes and remediation knobs;
      ``oversize="distributed"`` resolves them EXACTLY with the
      SCC-decomposed distributed greedy (partition_distributed.py —
      parallel grain = strongly-connected class, never the weak
      component; directed mode only); ``oversize="salvage"`` degrades
      LOUDLY to best-entity argmax for those components (documented
      approximation, no OOM).

    ``undirected=True`` is the reference's undirected graph mode:
    G3 max-spanning-forest filter, symmetrize, then prune
    (special_partition.pyx:391-414); the star fast path uses the
    distributed Boruvka forest, tie-identical to per-component Kruskal.
    """
    if oversize not in ("error", "salvage", "distributed"):
        raise ValueError(
            f"oversize must be 'error', 'salvage' or 'distributed', got {oversize!r}"
        )
    if oversize == "distributed" and undirected:
        # symmetrization makes every weak component one SCC, so the
        # SCC decomposition degenerates to one task per component —
        # no better than the status quo (partition_distributed.py
        # module docstring); refuse rather than pretend to distribute
        raise ValueError(
            "oversize='distributed' supports directed mode only: the "
            "undirected (G3) mode symmetrizes edges, which collapses "
            "each weak component into a single SCC and defeats the "
            "decomposition — use oversize='error'/'salvage' there"
        )
    e, stats, route = _route_components(edges, max_component_edges)
    big = F.col("n_edges") > F.lit(int(max_component_edges))
    counts = {
        r["route"]: r["n"]
        for r in stats.groupBy(route.alias("route")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    spark = edges.sparkSession
    parts: list[DataFrame] = []
    routed = e.join(stats.select("component", route.alias("route")), "component")
    if counts.get("star"):
        parts.append(_star_window_assign(routed.where(F.col("route") == "star"), undirected))
    if counts.get("greedy"):
        parts.append(
            routed.where(F.col("route") == "greedy")
            .groupBy("component")
            .applyInPandas(
                lambda pdf: _partition_one_component(pdf, undirected=undirected),
                schema=PARTITION_SCHEMA,
            )
        )
    if counts.get("over"):
        if oversize == "distributed":
            from blink_spark.operators.partition_distributed import (
                distributed_partition,
            )

            parts.append(
                distributed_partition(
                    routed.where(F.col("route") == "over").select(
                        "src", "dst", "score", "src_is_entity", "dst_is_entity"
                    )
                )
            )
        else:
            worst = (
                stats.where((F.col("not_star") == 1) & big)
                .orderBy(F.desc("n_edges"))
                .limit(5)
                .collect()
            )
            desc = ", ".join(
                f"component {r['component']}: {r['n_edges']} edges" for r in worst
            )
            if oversize == "error":
                raise ValueError(
                    f"entity_constrained_partition: {counts['over']} mixed "
                    f"component(s) exceed max_component_edges="
                    f"{max_component_edges} ({desc}). One applyInPandas task "
                    f"would hold each whole component. Remedies: raise the "
                    f"score threshold / lower mention_knn to fracture them, "
                    f"raise max_component_edges if executors have headroom, "
                    f"pass oversize='distributed' for the exact SCC-"
                    f"decomposed resolution of just these components, or "
                    f"oversize='salvage' for a best-entity-argmax "
                    f"degradation."
                )
            import warnings

            warnings.warn(
                f"entity_constrained_partition: degrading {counts['over']} "
                f"oversize mixed component(s) ({desc}) to best-entity argmax "
                f"(mention-mention edges ignored there).",
                stacklevel=2,
            )
            parts.append(_salvage_assign(routed.where(F.col("route") == "over")))
    if not parts:
        return spark.createDataFrame([], PARTITION_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
