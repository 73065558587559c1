"""Canonicalization: normalization parity, alias clustering, hot-key safety,
union-find merge."""

import pyarrow as pa
import ray.data as rd

from vectrain_ray import rules
from vectrain_ray.stages.canonicalize import (
    add_surface_norm,
    build_mapping,
    partial_surface_counts,
)
from vectrain_ray.state.unionfind import UnionFind


def test_vectorized_norm_matches_rules():
    surfs = ["Acme, Corp!", "  ALICE   Johnson ", "x", "Ümlaut Straße"]
    t = pa.table({"surface_form": pa.array(surfs)})
    got = add_surface_norm(t)["surface_norm"].to_pylist()
    assert got == [rules.normalize_surface(s) for s in surfs]


def _mentions(surfs):
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["c"] * len(surfs)),
                "turn_idx": pa.array(list(range(len(surfs))), pa.int32()),
                "mention_id": pa.array([f"m{i}" for i in range(len(surfs))]),
                "surface_form": pa.array(surfs),
                "span_start": pa.array([0] * len(surfs), pa.int32()),
                "span_end": pa.array([1] * len(surfs), pa.int32()),
            }
        )
    )


def test_partial_counts_collapse_hot_keys():
    batch = pa.table(
        {"surface_form": pa.array(["Acme Corp"] * 1000 + ["Rare Co"])}
    )
    out = partial_surface_counts(batch)
    assert out.num_rows == 2  # 1001 rows → 2 partial rows before any shuffle
    d = {r["surface_form"]: r["cnt"] for r in out.to_pylist()}
    assert d["Acme Corp"] == 1000


def test_alias_clustering_merges_suffix_variants():
    ds = _mentions(["Acme Corp", "Acme Inc", "acme corp", "Globex Ltd"])
    mapping = build_mapping(ds).to_pandas()
    by_norm = dict(zip(mapping["surface_norm"], mapping["entity_id"]))
    assert by_norm["acme corp"] == by_norm["acme inc"]
    assert by_norm["acme corp"] != by_norm["globex ltd"]
    # canonical name is the most frequent original casing of the cluster
    names = dict(zip(mapping["surface_norm"], mapping["canonical_name"]))
    assert names["acme corp"] in ("Acme Corp", "acme corp")


def test_extra_pairs_union_find_merge():
    ds = _mentions(["Acme Corp", "Globex Ltd", "Initech"])
    merged = build_mapping(ds, extra_pairs=[("acme corp", "globex ltd")]).to_pandas()
    by_norm = dict(zip(merged["surface_norm"], merged["entity_id"]))
    assert by_norm["acme corp"] == by_norm["globex ltd"]
    assert by_norm["initech"] != by_norm["acme corp"]


def test_union_find_groups():
    uf = UnionFind()
    uf.union("a", "b")
    uf.union("b", "c")
    uf.union("x", "y")
    gs = {tuple(sorted(v)) for v in uf.groups().values()}
    assert gs == {("a", "b", "c"), ("x", "y")}


def test_mapping_entity_ids_stable_across_runs(small_transcripts):
    from vectrain_ray.stages.extract import extract_batch, mentions_table

    ext = extract_batch(small_transcripts)
    m = mentions_table(ext)
    a = build_mapping(rd.from_arrow(m)).to_pandas()
    b = build_mapping(rd.from_arrow(m)).to_pandas()
    a = a.sort_values("surface_norm").reset_index(drop=True)
    b = b.sort_values("surface_norm").reset_index(drop=True)
    assert list(a["entity_id"]) == list(b["entity_id"])


def test_recombine_paths_identical():
    """The second-level surface-count combiner must not change the mapping:
    recombine on (any bundle size) ≡ recombine off, row for row."""
    surfs = (["Acme Corp"] * 40 + ["Acme, Corp."] * 25 + ["Beta LLC"] * 10
             + ["Gamma Inc", "Gamma  Inc", "delta"] * 3)

    def rows(ds):
        df = ds.to_pandas()
        df["aliases"] = df["aliases"].apply(tuple)
        return df.sort_values(["surface_norm"]).reset_index(drop=True)

    base = rows(build_mapping(_mentions(surfs), recombine_batch=None))
    for rb in (4, 64, 1 << 20):
        got = rows(build_mapping(_mentions(surfs), recombine_batch=rb))
        assert got.equals(base), f"recombine_batch={rb} diverged"


def test_mapping_from_partials_equals_direct():
    """build_mapping_from_partials over per-shard partials ≡ build_mapping
    over the union of mentions — the streaming mapping-rebuild path."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vectrain_ray.stages.canonicalize import (
        build_mapping,
        build_mapping_from_partials,
        surface_partials,
    )

    surfaces = (["Acme Corp"] * 5 + ["acme corp."] * 3 + ["Widget Inc"] * 4
                + ["Bob Smith"] * 2 + ["widget inc"] * 1)
    half = len(surfaces) // 2

    def ds_of(rows):
        return rd.from_arrow(pa.table({"surface_form": pa.array(rows)}))

    direct = build_mapping(ds_of(surfaces)).to_pandas()
    # build shard partials as materialized frames, then union — the stored
    # per-shard artifact layout of pipelines/resume.py phase 1.5
    p1 = surface_partials(ds_of(surfaces[:half])).to_pandas()
    p2 = surface_partials(ds_of(surfaces[half:])).to_pandas()
    union = rd.from_pandas(pd.concat([p1, p2], ignore_index=True))
    via_partials = build_mapping_from_partials(union).to_pandas()

    def canon(df):
        df = df.copy()
        df["aliases"] = df["aliases"].apply(tuple)
        return df.sort_values("surface_norm").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(direct), canon(via_partials))


def test_hot_surface_collapses_before_shuffle():
    """The skew claim, empirically: a Zipf-hot surface repeated 50k times in
    one batch leaves the combiner as EXACTLY ONE partial row — hot keys are
    defused before the all-to-all, the stronger guarantee salting
    approximates."""
    import pyarrow as pa

    from vectrain_ray.stages.canonicalize import partial_surface_counts

    batch = pa.table({
        "surface_form": pa.array(["Acme Corp"] * 50_000 + ["Globex"]),
        "conv_id": pa.array(["c"] * 50_001),
        "turn_idx": pa.array([0] * 50_001, pa.int32()),
    })
    out = partial_surface_counts(batch)
    assert out.num_rows == 2
    cnt = dict(zip(out["surface_form"].to_pylist(), out["cnt"].to_pylist()))
    assert cnt["Acme Corp"] == 50_000 and cnt["Globex"] == 1
