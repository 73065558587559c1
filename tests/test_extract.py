"""Distributed extraction matches the oracle regardless of batching /
partitioning — SURVEY.md §5 test 1 (ingest ordering) and the P/R target."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from vectrain_ray import oracle
from vectrain_ray.stages.extract import (
    extract_batch,
    filter_nonempty_text,
    mentions_table,
    triples_table,
)


def _oracle_rows(tbl: pa.Table):
    return oracle.extract_conversations(tbl.to_pylist())


@pytest.mark.parametrize("batch_size", [1, 7, 4096])
def test_extract_matches_oracle_any_batch_size(small_transcripts, batch_size):
    ds = rd.from_arrow(small_transcripts).map_batches(
        filter_nonempty_text, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
    got = ds.take_all()
    m_rows = [r for r in got if r["kind"] == "mention"]
    t_rows = [r for r in got if r["kind"] == "triple"]

    om, ot = _oracle_rows(small_transcripts)
    # NOTE: the synthetic corpus contains duplicate re-sent turns; both sides
    # see them, so compare multisets of rows including duplicates.
    got_m = sorted((r["conv_id"], r["turn_idx"], r["surface_form"],
                    r["span_start"], r["span_end"]) for r in m_rows)
    exp_m = sorted((r["conv_id"], r["turn_idx"], r["surface_form"],
                    r["span_start"], r["span_end"]) for r in om)
    # oracle dedups by (conv, turn) implicitly? No — it processes every row.
    assert got_m == exp_m

    got_t = sorted((r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
                   for r in t_rows)
    exp_t = sorted((r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
                   for r in ot)
    assert got_t == exp_t


def test_triple_precision_recall_vs_oracle(kg_result, small_transcripts):
    """P/R ≥ 0.95 target (BASELINE.md). The pipeline dedups duplicate
    re-sent turns; dedup the oracle's rows the same way before comparing."""
    res, _ = kg_result
    pred = [
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in res["triples"].take_all()
    ]
    _, ot = _oracle_rows(small_transcripts)
    ref = sorted(set((r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
                     for r in ot))
    p, r, f = oracle.triple_prf(pred, ref)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_empty_text_filtered(small_transcripts):
    ds = rd.from_arrow(small_transcripts)
    kept = ds.map_batches(filter_nonempty_text, batch_format="pyarrow")
    texts = [r["text"] for r in kept.select_columns(["text"]).take_all()]
    assert all(t and t.strip() for t in texts)
    n_empty = sum(1 for t in small_transcripts["text"].to_pylist()
                  if not t or not t.strip())
    assert n_empty > 0  # generator must actually exercise the rule
    assert len(texts) == small_transcripts.num_rows - n_empty


def test_projection_helpers_split_kinds(small_transcripts):
    ext = extract_batch(small_transcripts)
    m = mentions_table(ext)
    t = triples_table(ext)
    assert m.num_rows + t.num_rows == ext.num_rows
    assert "mention_id" in m.schema.names and "row_id" in t.schema.names


def test_prefilter_skips_candidate_free_sentences_with_exact_spans():
    """The [A-Z] pre-filter must not disturb absolute span offsets when a
    candidate-free sentence precedes a mention-bearing one."""
    import pyarrow as pa

    text = "let me check that. Alice Johnson works at Acme Corp."
    t = pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        # c2: entirely candidate-free -> filtered by the vectorized row gate
        "text": pa.array([text, "all lowercase, nothing here."]),
    })
    ext = extract_batch(t)
    assert set(ext["conv_id"].to_pylist()) == {"c1"}
    mentions = ext.filter(pc.equal(ext["kind"], "mention"))
    for surf, s, e in zip(mentions["surface_form"].to_pylist(),
                          mentions["span_start"].to_pylist(),
                          mentions["span_end"].to_pylist()):
        assert text[s:e] == surf, (surf, s, e)
    triples = ext.filter(pc.equal(ext["kind"], "triple"))
    assert [(r["subj"], r["pred"], r["obj"]) for r in triples.to_pylist()] \
        == [("Alice Johnson", "works_at", "Acme Corp")]


def test_novelized_corpus_extracts_identical_entities():
    """synth.novel_frac injects lowercase uniqueness tags INSIDE sentences:
    the memo worst case must still extract the same mentions and triples
    (spans shift; surfaces and triples do not)."""
    from vectrain_ray.synth import generate_transcripts

    a = generate_transcripts(12, 6, seed=5)
    b = generate_transcripts(12, 6, seed=5, novel_frac=1.0)
    assert a["text"].to_pylist() != b["text"].to_pylist()  # tags present

    def key(t):
        ext = extract_batch(t)
        return sorted(
            (r["conv_id"], r["turn_idx"], r["kind"], r["surface_form"],
             r["subj"], r["pred"], r["obj"])
            for r in ext.to_pylist())

    assert key(a) == key(b)
