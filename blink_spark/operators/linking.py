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


def entity_constrained_partition(
    edges: DataFrame, undirected: bool = False
) -> DataFrame:
    """Distributed G4: edges(src, dst, score, src_is_entity,
    dst_is_entity) -> (node_id, is_entity, entity_id) for every node
    in the graph. entity_id is NULL for mentions that cannot reach any
    entity (the reference never sees these — its kNN always returns
    entity candidates; blocking-based retrieval can come up empty).

    CC finds the weak components (O(log n) distributed rounds); the
    per-component greedy runs as one applyInPandas group per
    component, all components in parallel.

    ``undirected=True`` is the reference's undirected graph mode:
    each component is first G3-filtered to its maximum spanning
    forest, then symmetrized, then greedily pruned — the exact
    pipeline of special_partition.pyx:391-414.
    """
    sym = edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    comp = connected_components(sym)
    e = edges.join(
        comp.select(F.col("id").alias("src"), "component"), "src"
    )
    return e.groupBy("component").applyInPandas(
        lambda pdf: _partition_one_component(pdf, undirected=undirected),
        schema=PARTITION_SCHEMA,
    )
