"""Schema-agnostic unit tests for the round-6 parametric graph operators
(operators/graph.py).

Deliberately NOT testdata-bound: every test hand-builds an edge DataFrame
with arbitrary column names (frm/tto, follower/followee, ...) to prove the
operators work on a user's own schema — the extraction contract from
VERDICT r5 item #1. The fixture-bound registry queries (graph_bfs_hops,
graph_pagerank_parts, graph_triangle_count, graph_link_prediction[_capped])
keep pinning the exact-value semantics against the DuckDB oracles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataframe_differ_spark.operators.graph import (
    bfs_hops,
    degrees,
    link_prediction,
    pagerank,
    symmetrize,
    triangle_count,
)


# Canonical (a < b) undirected test graph:
#
#   1 - 2 - 3 - 4      K4 on {10,11,12,13}       isolated edge 20-21
#   (path)             (every node in 3 triangles)
_PATH = [(1, 2), (2, 3), (3, 4)]
_K4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
_EXTRA = [(20, 21)]


@pytest.fixture(scope="module")
def edges_df(spark):
    rows = [Row(frm=a, tto=b) for a, b in _PATH + _K4 + _EXTRA]
    return spark.createDataFrame(rows)


def test_symmetrize_and_degrees(spark, edges_df):
    sym = symmetrize(edges_df, src="frm", dst="tto")
    assert sym.count() == 2 * edges_df.count()
    assert sym.columns == ["frm", "tto"]
    deg = {r.node: r.degree for r in degrees(edges_df, "frm", "tto").collect()}
    assert deg[1] == 1 and deg[2] == 2 and deg[3] == 2 and deg[4] == 1
    assert all(deg[n] == 3 for n in (10, 11, 12, 13))
    assert deg[20] == deg[21] == 1


def test_bfs_hops_single_and_multi_source(spark, edges_df):
    roots = spark.createDataFrame([Row(start=1)])
    got = {
        r.node: r.hop
        for r in bfs_hops(edges_df, roots, "frm", "tto", max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # K4/isolated edge unreachable

    # multi-source: hop = distance to the NEAREST root
    roots2 = spark.createDataFrame([Row(s=1), Row(s=4)])
    got2 = {
        r.node: r.hop
        for r in bfs_hops(edges_df, roots2, "frm", "tto", max_hops=4).collect()
    }
    assert got2 == {1: 0, 4: 0, 2: 1, 3: 1}

    # hop bound respected
    got3 = {
        r.node: r.hop
        for r in bfs_hops(edges_df, roots, "frm", "tto", max_hops=1).collect()
    }
    assert got3 == {1: 0, 2: 1}


def test_triangle_count_k4(spark, edges_df):
    got = {
        r.node: (r.n_triangles, r.degree)
        for r in triangle_count(edges_df, "frm", "tto").collect()
    }
    # K4: C(3,2) = 3 triangles per node; path/isolated-edge nodes absent.
    assert got == {n: (3, 3) for n in (10, 11, 12, 13)}


def test_pagerank_sums_to_one_and_ranks_centers(spark, edges_df):
    pr = pagerank(edges_df, "frm", "tto", iters=8).collect()
    total = sum(r.pagerank for r in pr)
    assert abs(total - 1.0) < 1e-6  # rank mass conserved (no dangling)
    ranks = {r.node: r.pagerank for r in pr}
    # path centers (deg 2) outrank path endpoints (deg 1)
    assert ranks[2] > ranks[1] and ranks[3] > ranks[4]
    # regular components converge to uniform 1/|V| (K4 and the 2-clique)
    assert all(abs(ranks[n] - 0.1) < 1e-9 for n in (10, 11, 12, 13))
    # symmetric positions agree (portable decimal sums → exactly equal)
    assert ranks[1] == ranks[4] and ranks[2] == ranks[3]
    assert ranks[20] == ranks[21]


def test_pagerank_portable_matches_plain_doubles(spark, edges_df):
    a = {r.node: r.pagerank for r in pagerank(edges_df, "frm", "tto").collect()}
    b = {
        r.node: r.pagerank
        for r in pagerank(edges_df, "frm", "tto", portable=False).collect()
    }
    assert set(a) == set(b)
    assert all(abs(a[n] - b[n]) < 1e-9 for n in a)


def test_link_prediction_exact_scores(spark, edges_df):
    got = {
        (r.frm, r.tto): (r.n_common, r.n_union, r.jaccard)
        for r in link_prediction(edges_df, "frm", "tto").collect()
    }
    # path: 1-3 share neighbor {2}; union = N(1) ∪ N(3) = {2,4} → 1/2
    assert got[(1, 3)] == (1, 2, 0.5)
    # 2-4 share {3}; union = {1,3} → 1/2
    assert got[(2, 4)] == (1, 2, 0.5)
    # 1-4? no common neighbor — not a candidate
    assert (1, 4) not in got
    # K4 is complete: no missing pairs inside it
    assert not any(a in (10, 11, 12, 13) and b in (10, 11, 12, 13) for a, b in got)
    # existing edges never predicted
    assert (1, 2) not in got and (10, 11) not in got


def test_link_prediction_cap_equals_exact_when_unbinding(spark, edges_df):
    exact = sorted(
        map(tuple, link_prediction(edges_df, "frm", "tto").collect())
    )
    capped = sorted(
        map(tuple, link_prediction(edges_df, "frm", "tto", cap=10).collect())
    )
    assert exact == capped  # max degree 3 < cap → identical result


def test_link_prediction_cap_bounds_hub(spark):
    # star: hub 0 with 12 leaves; exact form yields C(12,2)=66 leaf pairs,
    # cap=4 keeps only C(4,2)=6 wedges through the hub.
    rows = [Row(a=0, b=i) for i in range(1, 13)]
    df = spark.createDataFrame(rows)
    exact = link_prediction(df, "a", "b").count()
    capped = link_prediction(df, "a", "b", cap=4).count()
    assert exact == 66
    assert capped == 6


def test_reserved_prefix_rejected(spark):
    df = spark.createDataFrame([Row(_g_u=1, b=2)])
    with pytest.raises(ValueError, match="_g_"):
        degrees(df, "_g_u", "b")


def test_triangle_count_cap_equals_exact_when_unbinding(spark, edges_df):
    # round 8: max oriented out-degree here is tiny, so cap=10 must be
    # a no-op — the capped-sibling agreement contract
    exact = sorted(map(tuple, triangle_count(edges_df, "frm", "tto").collect()))
    capped = sorted(
        map(tuple, triangle_count(edges_df, "frm", "tto", cap=10).collect())
    )
    assert exact == capped and exact  # K4 guarantees triangles exist


def test_triangle_count_cap_bounds_hot_vertex(spark):
    # a star/fan never makes a hot ORIENTED out-degree (compact-forward
    # pushes hub edges onto the leaves) — the genuine hot case is a
    # CLIQUE, where all degrees tie and orientation falls back to the
    # vertex id: vertex i keeps out-edges to every j > i, so vertex 0's
    # oriented out-degree is n-1. K12: exact triangles = C(12,3) = 220.
    n = 12
    rows = [Row(a=i, b=j) for i in range(n) for j in range(i + 1, n)]
    df = spark.createDataFrame(rows)
    exact = triangle_count(df, "a", "b")
    total_exact = exact.agg(F.sum("n_triangles")).collect()[0][0]
    assert total_exact == 3 * 220  # 220 triangles, 3 corners each
    capped = triangle_count(df, "a", "b", cap=4)
    rows_c = {r.node: r for r in capped.collect()}
    total_capped = sum(r.n_triangles for r in rows_c.values())
    # every vertex keeps <= 4 oriented out-neighbors, so triangles
    # through each wedge center are <= C(4,2) = 6: total <= 3*12*6
    assert 0 < total_capped < total_exact
    assert total_capped <= 3 * n * 6
    # true degrees are reported regardless of the cap
    assert all(r.degree == n - 1 for r in rows_c.values())


def test_kcore_peels_tendrils_keeps_clique(spark, edges_df):
    from dataframe_differ_spark.operators.graph import kcore

    # 2-core of path(1-2-3-4) + K4 + isolated edge: the path unravels
    # from its endpoints, the isolated edge peels immediately, K4 stays
    got = {
        r.node: r.core_degree
        for r in kcore(edges_df, "frm", "tto", k=2, rounds=6).collect()
    }
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


def test_kcore_fixed_rounds_converge_on_corpus(spark):
    from dataframe_differ_spark.operators.graph import kcore
    from dataframe_differ_spark.queries.composites import copurchase_edges

    edges = copurchase_edges(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, kcore(edges, "u", "v", k=3, rounds=8).collect()))
    b = sorted(map(tuple, kcore(edges, "u", "v", k=3, rounds=10).collect()))
    assert a == b and a  # converged within 8 rounds, core non-empty


def test_label_propagation_matches_python_reference(spark, edges_df):
    from dataframe_differ_spark.operators.graph import label_propagation

    # pure-python synchronous LPA with the same min-label tiebreak
    edges = _PATH + _K4 + _EXTRA
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(4):
        new = {}
        for n, ns in nbrs.items():
            cnt: dict = {}
            for m in ns:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            new[n] = min(cnt, key=lambda v: (-cnt[v], v))
        lab = new
    got = {
        r.node: r.label
        for r in label_propagation(edges_df, "frm", "tto", rounds=4).collect()
    }
    assert got == lab
    # K4 collapses into one community
    assert len({got[n] for n in (10, 11, 12, 13)}) == 1
