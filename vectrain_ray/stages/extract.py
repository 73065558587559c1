"""Stage 1 — mention detection + OpenIE-style triple extraction.

Ray-Data-native recast of the reference's per-record transform slot
(reference: JSON parse + empty-text admission,
internal/app/sources/http/client.go:78-112, kafka/fetch_messages.go:33-43):
a stateless `map_batches` over zero-copy Arrow batches. Regexes are compiled
once at module import (per worker process), not per batch.

One pass emits a combined narrow table (kind = mention | triple) so the
100 TB input is scanned ONCE; downstream branches filter by `kind` from the
much smaller extracted intermediate (SURVEY.md §7 step 2).

Every row carries a deterministic id (rules.stable_id) — this is what makes
re-processing idempotent, fixing the reference's fresh-UUID-per-write
(qdrant/store.go:32, TODO store.go:45): duplicate re-sent turns produce
byte-identical rows that exact-dedup removes.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .. import rules

EXTRACTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("kind", pa.string()),  # "mention" | "triple"
        ("row_id", pa.string()),  # deterministic; dedup key
        ("surface_form", pa.string()),  # mention rows
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("subj", pa.string()),  # triple rows
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)


def filter_nonempty_text(batch: pa.Table) -> pa.Table:
    """The empty-text admission rule (reference http/client.go:90-97),
    vectorized: drop rows whose text is null or whitespace-only."""
    text = batch["text"]
    stripped = pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    return batch.filter(pc.not_equal(stripped, ""))


# Per-worker-process sentence memo: mention/triple extraction is a pure
# function of the SENTENCE (spans are sentence-relative; ids are derived
# outside), and templated/conversational corpora repeat sentences heavily
# (68% duplicates measured within ONE bench file) — so each worker runs the
# regexes once per distinct sentence. Bounded; misses beyond the cap are
# computed without being retained.
_SENT_CACHE: dict = {}
_SENT_CACHE_MAX = 2_000_000

# Candidate pre-filter: MENTION_RE requires an uppercase letter, and triples
# require mentions — so text without [A-Z] provably emits nothing. Checked
# vectorized (Arrow RE2) per ROW, then per SENTENCE with one compiled C
# regex, so candidate-free sentences never reach the extraction regexes or
# the memo. This bounds the low-duplication worst case (VERDICT r2 item 6),
# where the sentence memo never hits.
_UPPER_RE = re.compile(r"[A-Z]")


def _sentence_extract(sentence: str):
    r = _SENT_CACHE.get(sentence)
    if r is None:
        m = rules.extract_mentions(sentence)
        tr = rules.extract_triples_from_sentence(sentence, mentions=m)
        r = (m, tr)
        if len(_SENT_CACHE) < _SENT_CACHE_MAX:
            _SENT_CACHE[sentence] = r
    return r


def extract_batch(batch: pa.Table) -> pa.Table:
    """transcripts batch → combined mention+triple rows (EXTRACTED_SCHEMA).

    Pure function of (conv_id, turn_idx, text); row order within the batch
    does not affect emitted rows, so arbitrary batching/partitioning yields
    the same multiset of rows (pinned by tests/test_extract.py).
    """
    # vectorized row-level pre-filter: drop rows that can't emit anything
    text_col = pc.fill_null(batch["text"], "")
    candidate = pc.match_substring_regex(text_col, "[A-Z]")
    batch = batch.filter(candidate)

    conv_ids = batch["conv_id"].to_pylist()
    turn_idxs = batch["turn_idx"].to_pylist()
    texts = batch["text"].to_pylist()

    o_conv, o_turn, o_kind, o_rid = [], [], [], []
    o_surf, o_ss, o_se = [], [], []
    o_subj, o_pred, o_obj = [], [], []

    sep_len = len(rules.SENTENCE_SEP)
    for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
        occ = 0
        off = 0
        for sentence in text.split(rules.SENTENCE_SEP):
            if _UPPER_RE.search(sentence) is None:
                off += len(sentence) + sep_len
                continue
            sent_mentions, sent_triples = _sentence_extract(sentence)
            for surf, s, e in sent_mentions:
                o_conv.append(conv_id)
                o_turn.append(turn_idx)
                o_kind.append("mention")
                o_rid.append(rules.stable_id(conv_id, turn_idx, off + s, off + e))
                o_surf.append(surf)
                o_ss.append(off + s)
                o_se.append(off + e)
                o_subj.append(None)
                o_pred.append(None)
                o_obj.append(None)
            for subj, pred, obj in sent_triples:
                o_conv.append(conv_id)
                o_turn.append(turn_idx)
                o_kind.append("triple")
                o_rid.append(rules.stable_id(conv_id, turn_idx, occ, subj, pred, obj))
                o_surf.append(None)
                o_ss.append(None)
                o_se.append(None)
                o_subj.append(subj)
                o_pred.append(pred)
                o_obj.append(obj)
                occ += 1
            off += len(sentence) + len(rules.SENTENCE_SEP)

    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "kind": pa.array(o_kind, pa.string()),
            "row_id": pa.array(o_rid, pa.string()),
            "surface_form": pa.array(o_surf, pa.string()),
            "span_start": pa.array(o_ss, pa.int32()),
            "span_end": pa.array(o_se, pa.int32()),
            "subj": pa.array(o_subj, pa.string()),
            "pred": pa.array(o_pred, pa.string()),
            "obj": pa.array(o_obj, pa.string()),
        },
        schema=EXTRACTED_SCHEMA,
    )


def mentions_table(extracted: pa.Table) -> pa.Table:
    """extracted batch → MENTION_SCHEMA projection (for map_batches)."""
    t = extracted.filter(pc.equal(extracted["kind"], "mention"))
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "mention_id": t["row_id"],
            "surface_form": t["surface_form"],
            "span_start": t["span_start"],
            "span_end": t["span_end"],
        }
    )


def triples_table(extracted: pa.Table) -> pa.Table:
    """extracted batch → TRIPLE_SCHEMA projection + row_id (for map_batches)."""
    t = extracted.filter(pc.equal(extracted["kind"], "triple"))
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "row_id": t["row_id"],
            "subj": t["subj"],
            "pred": t["pred"],
            "obj": t["obj"],
        }
    )
