"""Round-4 operators: sequence packing, SemDeDup, k-NN join, duplicated
token spans, skew-aware join — unit tests on hand-built tables (the sf0.01
oracle gate covers value parity; these pin edge semantics)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vectrain_ray.pipelines import queries as Q


def _write_docs(d: str, texts: list[str | None]) -> None:
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))


def _write_embeddings(d: str, vecs: list[list[float]]) -> None:
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))


def _df(res) -> pd.DataFrame:
    return res.to_pandas()


def test_pack_sequences_boundaries(tmp_path, ray_session):
    sf = str(tmp_path)
    # token counts 3, 2, 4, 0, 1 → cumulative-before 0, 3, 5, 9, 9
    _write_docs(sf, ["a b c", "d e", "f g h i", "", "j"])
    old = Q.PACK_BUDGET
    Q.PACK_BUDGET = 4  # boundaries: before // 4 → 0, 0, 1, 2, 2
    try:
        out = _df(Q.q_pack_sequences(sf)).sort_values("doc_id")
    finally:
        Q.PACK_BUDGET = old
    assert out["n_tokens"].tolist() == [3, 2, 4, 0, 1]
    assert out["seq_id"].tolist() == [0, 0, 1, 2, 2]


def test_pack_sequences_crosses_bucket_offsets(tmp_path, ray_session):
    """Docs spread over many doc_id range buckets still get GLOBALLY
    consistent seq ids (the driver prefix-sum over bucket totals)."""
    sf = str(tmp_path)
    texts = [" ".join(["w"] * 7) for _ in range(100)]  # 7 tokens each
    _write_docs(sf, texts)
    out = _df(Q.q_pack_sequences(sf)).sort_values("doc_id")
    before = np.arange(100) * 7
    assert out["seq_id"].tolist() == (before // Q.PACK_BUDGET).tolist()


def test_semantic_dedup_drops_exact_duplicate(tmp_path, ray_session):
    sf = str(tmp_path)
    base = np.eye(8, dtype=np.float32)
    vecs = [list(base[i % 8] + 0.001 * i) for i in range(10)]
    vecs[7] = vecs[2]  # exact duplicate of an earlier vector
    _write_embeddings(sf, vecs)
    out = _df(Q.q_semantic_dedup(sf))
    assert 7 not in set(out["vec_id"])  # duplicate dropped
    assert 2 in set(out["vec_id"])  # the earlier twin kept


def test_knn_join_excludes_self_and_ranks(tmp_path, ray_session):
    sf = str(tmp_path)
    rng = np.random.RandomState(7)
    X = rng.randn(120, 16).astype(np.float32)
    _write_embeddings(sf, [list(v) for v in X])
    out = _df(Q.q_knn_join(sf))
    q_ids = sorted(set(out["q_id"]))
    assert q_ids == [0, 50, 100]
    Xn = X.astype(np.float64)
    Xn = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
    for q in q_ids:
        sims = Xn @ Xn[q]
        sims[q] = -np.inf  # self excluded
        want = np.lexsort((np.arange(len(sims)), -sims))[:Q.KNN_K]
        got = out[out["q_id"] == q].sort_values(
            ["score", "n_id"], ascending=[False, True])["n_id"].tolist()
        assert got == list(want)
        assert q not in got


def test_dup_ngram_spans_cross_doc_only(tmp_path, ray_session):
    sf = str(tmp_path)
    shared = "alpha beta gamma delta epsilon"
    _write_docs(sf, [
        f"x {shared} y",          # contains the shared 5-gram
        f"{shared} z",            # contains it too → cross-doc dup
        "alpha beta gamma",       # < 5 tokens, produces no span
        "one two three four five one two three four five",  # self-repeat
    ])
    out = _df(Q.q_dup_ngram_spans(sf))
    assert shared in set(out["ngram"])
    row = out[out["ngram"] == shared].iloc[0]
    assert row["n_docs"] == 2 and row["n_occ"] == 2
    # the within-doc repeat spans only ONE doc → filtered by n_docs >= 2
    assert "one two three four five" not in set(out["ngram"])


def test_skew_join_matches_plain_join(tmp_path, ray_session):
    sf = str(tmp_path)
    # one pathological hot key (60% of the fact side) + a cold tail
    keys = [1] * 60 + list(range(2, 42))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
        "l_partkey": pa.array([0] * len(keys), pa.int64()),
        "l_suppkey": pa.array([0] * len(keys), pa.int64()),
        "l_linenumber": pa.array(range(len(keys)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(keys)),
        "l_extendedprice": pa.array([float(i) for i in range(len(keys))]),
        "l_discount": pa.array([0.0] * len(keys)),
        "l_tax": pa.array([0.0] * len(keys)),
        "l_returnflag": pa.array(["N"] * len(keys)),
        "l_linestatus": pa.array(["O"] * len(keys)),
        "l_shipdate": pa.array([0] * len(keys), pa.int64()).cast(
            pa.timestamp("us")),
    }), os.path.join(sf, "lineitem.parquet"))
    okeys = list(range(1, 40))  # keys 40, 41 have no dim row (inner drop)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_custkey": pa.array([0] * len(okeys), pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(okeys)),
        "o_totalprice": pa.array([100.0 + k for k in okeys]),
        "o_orderdate": pa.array([0] * len(okeys), pa.int64()).cast(
            pa.timestamp("us")),
        "o_orderpriority": pa.array([f"p{k % 3}" for k in okeys]),
    }), os.path.join(sf, "orders.parquet"))

    got = _df(Q.q_skew_join(sf)).sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    fact = pq.read_table(os.path.join(sf, "lineitem.parquet")).to_pandas()
    dim = pq.read_table(os.path.join(sf, "orders.parquet")).to_pandas()
    want = fact.merge(dim, left_on="l_orderkey", right_on="o_orderkey")[
        ["l_orderkey", "l_linenumber", "l_extendedprice",
         "o_totalprice", "o_orderpriority"]].sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the hot key really took the broadcast path
    assert (fact["l_orderkey"] == 1).sum() >= Q.SKEW_HOT_MIN


def test_tokenized_docs_cache_invalidates_on_rewrite(tmp_path, ray_session):
    """The tokenize-once intermediate must not serve stale lists after the
    input is regenerated in place (same _cache_key discipline as the
    MinHash clustering artifact)."""
    sf = str(tmp_path)
    _write_docs(sf, ["a b", "c"])
    first = _df(Q.q_wordcount(sf))
    assert set(first["word"]) == {"a", "b", "c"}
    # rewrite the table in place → fingerprint (size/mtime) changes
    _write_docs(sf, ["x y z", "x"])
    second = _df(Q.q_wordcount(sf))
    assert set(second["word"]) == {"x", "y", "z"}


def test_window_dedup_keeps_first_per_tumbling_window(tmp_path, ray_session):
    sf = str(tmp_path)
    base = 1_700_000_000_000_000  # epoch µs, on an hour boundary? derive wins
    rows = [
        # same user/type, same hour window → only the earliest survives
        (0, 7, "click", base),
        (1, 7, "click", base + 10_000_000),
        # same user/type, NEXT hour window → emitted again
        (2, 7, "click", base + 3_600_000_000),
        # different type in the first window → kept independently
        (3, 7, "view", base + 5_000_000),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[3] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), os.path.join(sf, "events.parquet"))
    out = _df(Q.QUERIES["window_dedup"](sf)).sort_values("event_id")
    assert out["event_id"].tolist() == [0, 2, 3]
    w = out.set_index("event_id")["window_start"]
    assert w[0] == (base // 1_000_000) // 3600 * 3600
    assert w[2] == w[0] + 3600


def test_window_dedup_pre_epoch_and_null_ts_match_oracle(tmp_path,
                                                         ray_session):
    """The two oracle-parity corners a clean fixture never hits: DuckDB //
    TRUNCATES toward zero (pre-epoch timestamps), and NULL ts rows form
    ONE partition per key with a NULL window_start."""
    import duckdb

    sf = str(tmp_path)
    hour_us = 3_600_000_000
    rows = [  # (event_id, ts_us or None)
        (0, -1800_000_000),   # 23:30 before epoch → trunc window 0
        (1, 1800_000_000),    # 00:30 after epoch → window 0 too
        (2, -2 * hour_us),    # exactly -2h → trunc window -2
        (3, None),            # NULL ts
        (4, None),            # same key, NULL ts → deduped with 3
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([7] * len(rows), pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), os.path.join(sf, "events.parquet"))
    got = _df(Q.QUERIES["window_dedup"](sf))
    got = got.sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{os.path.join(sf, 'events.parquet')}')")
    from vectrain_ray.pipelines.queries import ORACLE_SQL

    want = con.execute(ORACLE_SQL["window_dedup"]).df().sort_values(
        "event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert [None if pd.isna(v) else int(v)
            for v in got["window_start"]] == \
           [None if pd.isna(v) else int(v) for v in want["window_start"]]


def test_empty_corpus_contracts(tmp_path, ray_session):
    """Empty inputs return DATASETS (run.py materialize()s every result)."""
    import ray.data as rd

    sf = str(tmp_path)
    _write_docs(sf, [])
    _write_embeddings(sf, [])
    for name in ("pack_sequences", "semantic_dedup", "knn_join",
                 "dup_ngram_spans"):
        res = Q.QUERIES[name](sf)
        assert isinstance(res, rd.Dataset), name
        assert res.count() == 0, name
