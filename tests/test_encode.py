"""Embedder-batching semantics — SURVEY.md §5 test 2: every row exactly once,
Vector xor Err, determinism across batch_size/concurrency (reference
pipeline.go:242-273 re-expressed)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vectrain_ray.stages.encode import HashingEncoder, encode_texts


def _mention_ds(n=500):
    return rd.from_arrow(
        pa.table(
            {
                "mention_id": pa.array([f"m{i}" for i in range(n)]),
                "surface_form": pa.array(
                    [f"Entity {i % 37}" if i % 50 else "" for i in range(n)]
                ),
            }
        )
    )


@pytest.mark.parametrize("batch_size,concurrency", [(32, 1), (101, 2), (4096, 2)])
def test_exactly_once_any_batching(batch_size, concurrency):
    ds = _mention_ds()
    out = ds.map_batches(
        HashingEncoder,
        fn_constructor_kwargs={"dim": 16},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).take_all()
    assert sorted(r["mention_id"] for r in out) == sorted(
        r["mention_id"] for r in _mention_ds().take_all()
    )
    for r in out:
        has_vec = any(v != 0 for v in r["embedding"])
        has_err = r["encode_err"] is not None
        assert has_vec != has_err  # Vector xor Err (pipeline.go:259-264)


def test_deterministic_across_processes_and_batching():
    a = encode_texts(["Acme Corp", "alice"], dim=32)
    b = encode_texts(["alice", "Acme Corp"], dim=32)[::-1].copy()
    np.testing.assert_array_equal(a, b)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_same_tokens_same_vector():
    a = encode_texts(["Acme Corp"], dim=32)
    b = encode_texts(["acme CORP"], dim=32)  # case-insensitive tokens
    np.testing.assert_array_equal(a, b)


def test_error_rows_carry_dead_letter():
    mat = encode_texts(["", "ok"], dim=8)
    assert not mat[0].any()
    enc = HashingEncoder(dim=8)
    _, errs = enc._encode_texts(["", "ok", None])
    assert errs[0] == "empty_text" and errs[1] is None and errs[2] == "empty_text"
