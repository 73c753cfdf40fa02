"""G4 de-starring: entity-star-only components must resolve via pure
window argmax (no applyInPandas task ever holds a component — the
hot-entity skew fix), bit-identical to the per-component greedy; mixed
oversize components must fail loudly or degrade loudly, never OOM.

Reference semantics under test: special_partition.pyx:288-356 (greedy)
and :391-414 (undirected MST prefilter)."""

import pytest
from pyspark.sql import functions as F

from blink_spark.operators.linking import (
    assign_entities_py,
    entity_constrained_partition,
    entity_reachable_nodes,
    special_partition_py,
)

EDGE_SCHEMA = (
    "src long, dst long, score double, src_is_entity boolean, dst_is_entity boolean"
)


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(s, d, float(w), bool(se), bool(de)) for s, d, w, se, de in rows],
        EDGE_SCHEMA,
    )


def _greedy_oracle(rows):
    """Run the pure-Python greedy over the WHOLE edge list (components
    don't interact, so one global run equals per-component runs)."""
    entities = {d for _, d, _, _, de in rows if de} | {
        s for s, _, _, se, _ in rows if se
    }
    edges = [(s, d, w) for s, d, w, _, _ in rows]
    ok = entity_reachable_nodes([(s, d) for s, d, _ in edges], entities)
    live = [(s, d, w) for s, d, w in edges if s in ok and d in ok]
    assign = assign_entities_py(special_partition_py(live, entities), entities)
    nodes = {}
    for s, d, _, se, de in rows:
        nodes[s] = nodes.get(s, False) or se
        nodes[d] = nodes.get(d, False) or de
    return {
        n: (is_ent, assign.get(n)) for n, is_ent in nodes.items()
    }


def _collect_partition(df):
    return {
        r["node_id"]: (r["is_entity"], r["entity_id"]) for r in df.collect()
    }


# --------------------------------------------------------- star fast path

def _star_rows(n_mentions=300, n_entities=7):
    """Multi-entity star soup with score ties and duplicate (src, dst)
    rows — every greedy tie-break shape, zero mention-mention edges."""
    rows = []
    for m in range(1000, 1000 + n_mentions):
        e1 = m % n_entities
        e2 = (m * 7 + 3) % n_entities
        rows.append((m, e1, round(0.1 + (m % 13) / 20.0, 3), False, True))
        if e2 != e1:
            # exact tie with the first edge for every 5th mention
            w = round(0.1 + (m % 13) / 20.0, 3) if m % 5 == 0 else 0.05
            rows.append((m, e2, w, False, True))
        if m % 9 == 0:  # duplicate (src, dst) at a different weight
            rows.append((m, e1, 0.01, False, True))
    return rows


def test_star_matches_greedy_directed(spark):
    rows = _star_rows()
    got = _collect_partition(entity_constrained_partition(_edges_df(spark, rows)))
    assert got == _greedy_oracle(rows)


def test_star_plan_has_no_pandas_group(spark):
    rows = _star_rows(n_mentions=60, n_entities=3)
    part = entity_constrained_partition(_edges_df(spark, rows))
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan, plan


def test_star_undirected_matches_kruskal_greedy(spark):
    """Undirected star routing must equal MST-prefilter + greedy,
    including the tied-score 4-cycle case where the forest's kept-edge
    set differs from a raw argmax."""
    from blink_spark.operators.mst import max_spanning_forest_py

    rows = _star_rows(n_mentions=120, n_entities=4)
    # explicit tied 4-cycle: mentions 9001, 9002 x entities 5001, 5002
    rows += [
        (9001, 5001, 0.7, False, True),
        (9001, 5002, 0.7, False, True),
        (9002, 5001, 0.7, False, True),
        (9002, 5002, 0.7, False, True),
    ]
    got = _collect_partition(
        entity_constrained_partition(_edges_df(spark, rows), undirected=True)
    )
    # oracle: per weak component, Kruskal forest -> symmetrize -> greedy
    entities = {d for _, d, _, _, de in rows if de}
    forest = max_spanning_forest_py([(s, d, w) for s, d, w, _, _ in rows])
    sym = [(s, d, w) for s, d, w in forest] + [(d, s, w) for s, d, w in forest]
    ok = entity_reachable_nodes([(s, d) for s, d, _ in sym], entities)
    live = [(s, d, w) for s, d, w in sym if s in ok and d in ok]
    assign = assign_entities_py(special_partition_py(live, entities), entities)
    for n, (is_ent, ent) in got.items():
        if is_ent:
            assert ent == n
        else:
            assert ent == assign.get(n), f"node {n}: {ent} != {assign.get(n)}"


def test_large_star_completes_distributed(spark):
    """The VERDICT scale shape: one popular entity, 20k mentions, no
    mention-mention edges — previously one applyInPandas task."""
    rows = [(10_000 + i, 1, 0.5 + (i % 10) / 100.0, False, True) for i in range(20_000)]
    part = entity_constrained_partition(_edges_df(spark, rows))
    agg = part.where(~F.col("is_entity")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("entity_id") == 1).cast("long")).alias("ok"),
    ).collect()[0]
    assert agg["n"] == 20_000 and agg["ok"] == 20_000


# --------------------------------------------------------- mixed routing

def _mixed_rows():
    """One star component (mentions 100x) + one mixed chain component
    (mentions 200x -> entity 50)."""
    rows = [(101, 1, 0.9, False, True), (102, 1, 0.8, False, True)]
    rows += [
        (201, 202, 0.6, False, False),
        (202, 203, 0.7, False, False),
        (203, 50, 0.9, False, True),
    ]
    return rows


def test_mixed_components_still_exact(spark):
    rows = _mixed_rows()
    got = _collect_partition(entity_constrained_partition(_edges_df(spark, rows)))
    assert got == _greedy_oracle(rows)
    # the chain resolves through the greedy, not the argmax
    assert got[201] == (False, 50) and got[202] == (False, 50)


def test_oversize_mixed_component_errors(spark):
    rows = _mixed_rows()
    with pytest.raises(ValueError, match="max_component_edges"):
        entity_constrained_partition(
            _edges_df(spark, rows), max_component_edges=2
        ).collect()


def test_oversize_salvage_degrades_loudly(spark):
    rows = _mixed_rows()
    with pytest.warns(UserWarning, match="best-entity argmax"):
        part = entity_constrained_partition(
            _edges_df(spark, rows), max_component_edges=2, oversize="salvage"
        )
        got = _collect_partition(part)
    # star component untouched; chain mentions degrade: 203 takes its
    # direct entity edge, 201/202 have none -> NULL
    assert got[101] == (False, 1) and got[102] == (False, 1)
    assert got[203] == (False, 50)
    assert got[201] == (False, None) and got[202] == (False, None)
    assert got[50] == (True, 50)
