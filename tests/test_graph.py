"""Graph analytics (functions/graph.py) on hand-checkable graphs."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from vectrain_ray.functions.graph import (
    connected_components,
    khop_hops,
    pagerank_int,
    triangle_count,
)


def _edges(pairs, dtype=None):
    u, v = zip(*pairs)
    return rd.from_arrow(pa.table({"src": pa.array(list(u), type=dtype),
                                   "dst": pa.array(list(v), type=dtype)}))


def test_components_two_chains():
    # chain a-b-c-d plus chain x-y; direction and duplicates must not matter
    ds = _edges([("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"), ("x", "y")])
    got = connected_components(ds).to_pandas().set_index("node")["component"]
    assert got.to_dict() == {"a": "a", "b": "a", "c": "a", "d": "a",
                             "x": "x", "y": "x"}


def test_components_join_path_matches_broadcast():
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(0, 20, 2)]  # 10 pairs
    pairs += [("n0", "n2"), ("n5", "n7")]
    b = connected_components(_edges(pairs)).to_pandas().sort_values(
        "node").reset_index(drop=True)
    j = connected_components(_edges(pairs), broadcast_max=1).to_pandas(
    ).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)


def test_triangle_count_known_graphs():
    # K4 has 4 triangles; adding a pendant edge changes nothing
    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    assert triangle_count(_edges(k4))["n_triangles"][0].as_py() == 4
    assert triangle_count(_edges(k4 + [("d", "e")]))["n_triangles"][0].as_py() == 4
    # triangle + disjoint edge, with reversed duplicates
    g = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("p", "q")]
    assert triangle_count(_edges(g))["n_triangles"][0].as_py() == 1


def test_pagerank_int_matches_pure_python():
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    got = pagerank_int(_edges(pairs, pa.int64()), iters=3).to_pandas()
    # reference: same integer recurrence in pure python
    scale = 10 ** 12
    e = sorted(set(pairs))
    nodes = sorted({n for p in e for n in p})
    outdeg = {u: sum(1 for a, _ in e if a == u) for u in nodes}
    r = {n: scale for n in nodes}
    for _ in range(3):
        s = {n: 0 for n in nodes}
        for u, v in e:
            s[v] += r[u] // outdeg[u]
        r = {n: (15 * scale) // 100 + (85 * s[n]) // 100 for n in nodes}
    assert dict(zip(got["node"], got["pr"])) == r


def test_pagerank_join_path_matches_broadcast():
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 2), (2, 5)]
    b = pagerank_int(_edges(pairs, pa.int64()), iters=3).to_pandas(
    ).sort_values("node").reset_index(drop=True)
    j = pagerank_int(_edges(pairs, pa.int64()), iters=3,
                     broadcast_max=1).to_pandas().sort_values(
        "node").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)


def test_triangle_join_path_matches_broadcast():
    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    g = k4 + [("d", "e"), ("e", "f"), ("f", "d"), ("p", "q")]
    assert triangle_count(_edges(g))["n_triangles"][0].as_py() == 5
    assert triangle_count(_edges(g),
                          broadcast_max=1)["n_triangles"][0].as_py() == 5


def test_khop_min_hops():
    # 1→2→3→4→5 and shortcut 1→4
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    t = khop_hops(_edges(pairs, pa.int64()), [1], 3)
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    # k bounds the search: from 1 with k=1 only direct neighbours
    t1 = khop_hops(_edges(pairs, pa.int64()), [1], 1)
    got1 = dict(zip(t1["node"].to_pylist(), t1["hops"].to_pylist()))
    assert got1 == {1: 0, 2: 1, 4: 1}


def test_khop_join_path_matches_broadcast():
    from vectrain_ray.functions.graph import khop_hops_ds

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (6, 7)]
    b = khop_hops(_edges(pairs, pa.int64()), [1, 6], 3).to_pandas(
    ).sort_values("node").reset_index(drop=True)
    j = khop_hops_ds(_edges(pairs, pa.int64()), [1, 6], 3).to_pandas(
    ).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)
    # empty edge set: seeds only, hop 0
    e = khop_hops_ds(_edges([(9, 9)], pa.int64()), [1], 2).to_pandas()
    assert e.to_dict("records") == [{"node": 1, "hops": 0}]


def test_khop_join_path_int32_edges():
    """Seed type reconciles with the edge id type (int32 edges, python-int
    seeds) — the join keys and hop unions must not type-mismatch."""
    from vectrain_ray.functions.graph import khop_hops_ds

    pairs = [(1, 2), (2, 3)]
    j = khop_hops_ds(_edges(pairs, pa.int32()), [1], 2).to_pandas()
    assert dict(zip(j["node"], j["hops"])) == {1: 0, 2: 1, 3: 2}


def test_components_empty_edges():
    ds = connected_components(_edges([("a", "a")]))
    assert ds.count() == 0
    assert ds.schema().names == ["node", "component"]
