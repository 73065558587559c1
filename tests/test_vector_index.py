"""Persisted IVF vector index (state/vector_index.py) — the queryable
vector-store sink (reference qdrant/store.go:13-51, 91-114).

Done-criterion from VERDICT r1 item 7: persisted-index top-k equals
brute-force topk_cosine at small scale when n_probe = n_centroids; bounded
recall loss otherwise; idempotent upsert by id."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vectrain_ray.functions.similarity import topk_cosine
from vectrain_ray.state.vector_index import (
    build_ivf_index,
    query_ivf_index,
    upsert_ivf_index,
)

DIM = 16
N = 400


def _vecs(n=N, seed=7, start=0):
    rng = np.random.RandomState(seed)
    return pa.table({
        "vec_id": pa.array(range(start, start + n), pa.int64()),
        "embedding": pa.array(
            [row.tolist() for row in rng.standard_normal((n, DIM))],
            pa.list_(pa.float64())),
    })


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(rd.from_arrow(_vecs()), d, dim=DIM, n_centroids=8)
    return d


def test_query_exact_when_probing_all_cells(index_dir):
    q = _vecs()["embedding"][5].as_py()
    got = query_ivf_index(index_dir, q, k=10, n_probe=8)
    exp = topk_cosine(rd.from_arrow(_vecs()), q, k=10).to_pandas()
    assert got["vec_id"].to_pylist() == exp["vec_id"].tolist()
    assert got["score"].to_pylist() == pytest.approx(exp["score"].tolist())


def test_partial_probe_recall_bounded(index_dir):
    """n_probe=2 of 8: the query's own cell is always probed, so the top-1
    (the vector itself, cosine 1.0) must be found; recall@10 >= 0.5 on
    random gaussians (generous bound — flags only catastrophic breakage)."""
    q = _vecs()["embedding"][123].as_py()
    got = query_ivf_index(index_dir, q, k=10, n_probe=2)
    assert got["vec_id"][0].as_py() == 123
    exp = topk_cosine(rd.from_arrow(_vecs()), q, k=10).to_pandas()
    overlap = len(set(got["vec_id"].to_pylist()) & set(exp["vec_id"]))
    assert overlap >= 5


def test_artifact_layout_and_meta(index_dir):
    import glob
    import json
    import os

    assert os.path.exists(os.path.join(index_dir, "_DONE"))
    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    assert meta["dim"] == DIM and meta["n_rows"] == N
    cells = glob.glob(os.path.join(index_dir, "cells", "ivf_cell=*"))
    assert 1 < len(cells) <= 8
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    assert cents.shape == (8, DIM)


def test_upsert_idempotent_and_additive(tmp_path):
    d = str(tmp_path / "idx")
    build_ivf_index(rd.from_arrow(_vecs(100)), d, dim=DIM, n_centroids=4)
    # re-upsert the SAME 100 ids (idempotent re-ingest — the reference's
    # at-least-once redelivery case) + 20 new ones
    upsert_ivf_index(rd.from_arrow(_vecs(100)), d)
    upsert_ivf_index(rd.from_arrow(_vecs(20, seed=9, start=100)), d)
    q = _vecs(100)["embedding"][0].as_py()
    got = query_ivf_index(d, q, k=120, n_probe=4)
    ids = got["vec_id"].to_pylist()
    assert len(ids) == len(set(ids)) == 120  # no dupes from the re-ingest
    assert got["vec_id"][0].as_py() == 0  # self still top-1


def test_upsert_changed_vector_no_duplicate_when_both_cells_probed(tmp_path):
    """Regression (review finding): an upsert that MOVES a vector to a new
    cell must not surface the stale copy when both cells are probed —
    last-generation-wins is global across probed cells."""
    d = str(tmp_path / "idx")
    build_ivf_index(rd.from_arrow(_vecs(100)), d, dim=DIM, n_centroids=4)
    # replace id 0 with a completely different vector (new cell, gen 1)
    moved = _vecs(1, seed=999)
    moved = moved.set_column(0, "vec_id", pa.array([0], pa.int64()))
    upsert_ivf_index(rd.from_arrow(moved), d)
    q = moved["embedding"][0].as_py()
    got = query_ivf_index(d, q, k=100, n_probe=4)  # probe ALL cells
    ids = got["vec_id"].to_pylist()
    assert ids.count(0) == 1  # stale gen-0 copy suppressed
    assert got["vec_id"][0].as_py() == 0  # new vector is its own top-1
    assert got["score"][0].as_py() == 1.0
