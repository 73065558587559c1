"""Edge aggregation: packed-partial merge correctness and the optional
second-level recombine path."""

import pyarrow as pa
import ray.data as rd

from vectrain_ray.stages.materialize import edges_from_linked


def _linked(rows):
    """rows: list of (subj_id, obj_id, pred, conv_id, turn_idx)."""
    return rd.from_arrow(
        pa.table(
            {
                "subj_id": pa.array([r[0] for r in rows]),
                "obj_id": pa.array([r[1] for r in rows]),
                "pred": pa.array([r[2] for r in rows]),
                "conv_id": pa.array([r[3] for r in rows]),
                "turn_idx": pa.array([r[4] for r in rows], pa.int32()),
            }
        )
    )


def _canon(ds):
    df = ds.to_pandas()
    df["prov"] = df["prov"].apply(tuple)
    return df.sort_values(["src_id", "dst_id", "pred"]).reset_index(drop=True)


def test_edge_recombine_paths_identical():
    """recombine on (any bundle size) ≡ recombine off: weights and the
    min-k capped provenance lists must match row for row."""
    rows = []
    # one dense edge spread over many convs (exercises the PROV_CAP min-k
    # merge) + a few sparse edges
    for i in range(60):
        rows.append(("a", "b", "works_at", f"conv{i:03d}", i % 7))
    rows += [("a", "c", "knows", "convX", 1), ("d", "b", "knows", "convY", 2),
             ("a", "b", "works_at", "conv000", 0)]  # dup prov within an edge
    ds = _linked(rows)
    base = _canon(edges_from_linked(ds, recombine_batch=None))
    assert (base["weight"] >= 1).all()
    dense = base[(base["src_id"] == "a") & (base["pred"] == "works_at")]
    assert int(dense["weight"].iloc[0]) == 61
    assert len(dense["prov"].iloc[0]) == 20  # PROV_CAP
    for rb in (8, 1 << 20):
        got = _canon(edges_from_linked(_linked(rows), recombine_batch=rb))
        assert got.equals(base), f"recombine_batch={rb} diverged"
