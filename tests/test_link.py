"""Entity-linking semantics: exact dict hit, fuzzy cosine fallback,
deterministic new-entity minting for true misses."""

import pandas as pd
import pyarrow as pa
import ray

from vectrain_ray import rules
from vectrain_ray.stages.link import EntityLinker, build_link_index


def _index_ref():
    mapping = pd.DataFrame(
        {
            "surface_norm": ["acme corp", "globex ltd", "alice johnson"],
            "entity_id": ["E1", "E2", "E3"],
            "canonical_name": ["Acme Corp", "Globex Ltd", "Alice Johnson"],
        }
    )
    return ray.put(build_link_index(mapping, dim=64))


def test_exact_hit_via_normalization():
    linker = EntityLinker(_index_ref(), cols=("subj",), dim=64)
    t = pa.table({"subj": pa.array(["ACME corp", "Acme, Corp!", "Globex Ltd"])})
    out = linker(t)
    assert out["subj_id"].to_pylist() == ["E1", "E1", "E2"]


def test_fuzzy_fallback_links_token_overlap():
    linker = EntityLinker(_index_ref(), cols=("subj",), dim=64,
                          fuzzy_threshold=0.7)
    # "corp acme" has identical token multiset → cosine 1.0 vs "acme corp"
    out = linker(pa.table({"subj": pa.array(["corp acme"])}))
    assert out["subj_id"].to_pylist() == ["E1"]


def test_true_miss_gets_deterministic_new_id():
    linker = EntityLinker(_index_ref(), cols=("subj",), dim=64,
                          fuzzy_threshold=0.99)
    out1 = linker(pa.table({"subj": pa.array(["Zzyzx Industries"])}))
    out2 = linker(pa.table({"subj": pa.array(["Zzyzx Industries"])}))
    eid = out1["subj_id"].to_pylist()[0]
    assert eid == out2["subj_id"].to_pylist()[0]
    assert eid == rules.stable_id(
        "ent", rules.canonical_merge_key(rules.normalize_surface("Zzyzx Industries"))
    )
    assert eid not in {"E1", "E2", "E3"}


def test_null_surface_passes_through():
    linker = EntityLinker(_index_ref(), cols=("subj",), dim=64)
    out = linker(pa.table({"subj": pa.array([None, "Acme Corp"])}))
    assert out["subj_id"].to_pylist() == [None, "E1"]
