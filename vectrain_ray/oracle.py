"""Plain-Python (non-Ray) reference implementation — the oracle.

Runs per conversation in stable turn order, exactly as a single-process
reference engine would (the reference's consume loop forwards batches in
arrival order, /root/reference/internal/app/pipeline/pipeline.go:147-180).
The distributed pipeline's output is compared against this for the triple
P/R ≥ 0.95 target and the per-turn text-equality invariant (SURVEY.md §5).

Deliberately simple loops — clarity over speed; this never runs at scale.
"""

from __future__ import annotations

from collections import Counter

from . import rules


def split_sentences(text: str) -> list[tuple[str, int]]:
    """[(sentence, offset_in_text)] using the literal rule-book separator."""
    out = []
    off = 0
    for part in text.split(rules.SENTENCE_SEP):
        out.append((part, off))
        off += len(part) + len(rules.SENTENCE_SEP)
    return out


def extract_turn(text: str):
    """One turn → (mentions, triples).

    mentions: [(surface, span_start, span_end)] with spans into the full text.
    triples:  [(subj, pred, obj)].
    """
    mentions, triples = [], []
    for sentence, off in split_sentences(text):
        for surf, s, e in rules.extract_mentions(sentence):
            mentions.append((surf, off + s, off + e))
        triples.extend(rules.extract_triples_from_sentence(sentence))
    return mentions, triples


def extract_conversations(rows: list[dict]) -> tuple[list[dict], list[dict]]:
    """rows: transcript dicts (conv_id, turn_idx, role, text, ...).

    Processes each conversation in ascending turn_idx (the ordering
    invariant), skipping empty/whitespace text (the reference's empty-text
    admission rule, internal/app/sources/http/client.go:90-97).
    Returns (mention_rows, triple_rows) as dicts matching
    schema.MENTION_SCHEMA / schema.TRIPLE_SCHEMA.
    """
    by_conv: dict[str, list[dict]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    mention_rows, triple_rows = [], []
    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r["turn_idx"])
        for r in turns:
            text = r.get("text") or ""
            if not text.strip():
                continue
            mentions, triples = extract_turn(text)
            for surf, s, e in mentions:
                mention_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": r["turn_idx"],
                        "mention_id": rules.stable_id(conv_id, r["turn_idx"], s, e),
                        "surface_form": surf,
                        "span_start": s,
                        "span_end": e,
                    }
                )
            for subj, pred, obj in triples:
                triple_rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": r["turn_idx"],
                        "subj": subj,
                        "pred": pred,
                        "obj": obj,
                    }
                )
    return mention_rows, triple_rows


def triple_prf(
    predicted: list[tuple], reference: list[tuple]
) -> tuple[float, float, float]:
    """Multiset precision/recall/F1 over (conv_id, turn_idx, subj, pred, obj)."""
    pc, rc = Counter(predicted), Counter(reference)
    tp = sum(min(pc[k], rc[k]) for k in pc)
    p = tp / max(1, sum(pc.values()))
    r = tp / max(1, sum(rc.values()))
    f = 2 * p * r / max(1e-12, p + r)
    return p, r, f
