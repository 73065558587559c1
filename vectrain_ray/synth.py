"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Seed-fixed, no external data. Properties designed to exercise the engine:
  * entity mentions drawn from a seeded vocab with Zipf skew → provokes
    hot-key handling in the canonicalization groupby (SURVEY.md §7 hard parts);
  * a fraction of empty/whitespace text rows → exercises the empty-text
    admission rule (reference internal/app/sources/http/client.go:90-97);
  * duplicate re-sends of some turns → exercises idempotent writes
    (reference TODO internal/app/storages/qdrant/store.go:45);
  * alias variants ("Acme Corp" / "Acme Inc") → exercises union-find merge.

Also: `transcripts_from_documents` derives a transcript table from the
driver-provided documents.parquet deterministically (used by __ray_entry__).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import rules
from .schema import TRANSCRIPT_SCHEMA

_FIRST = ["Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
          "Irene", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Peter",
          "Quinn", "Rosa", "Sam", "Tina"]
_LAST = ["Johnson", "Smith", "Garcia", "Chen", "Patel", "Kim", "Novak",
         "Mueller", "Rossi", "Tanaka", "Okafor", "Silva", "Dubois", "Ivanov"]
_ORG_STEM = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
             "Hooli", "Vandelay", "Wonka", "Tyrell", "Cyberdyne", "Aperture",
             "BlueSky", "RedRock", "Quantum", "Helios", "Nimbus", "Vertex",
             "Orion", "Zenith"]
_ORG_SUFFIX = ["Corp", "Inc", "Ltd", "Labs", "Systems", ""]
_CITY = ["Paris", "Berlin", "Tokyo", "Austin", "Toronto", "Lisbon", "Oslo",
         "Prague", "Seoul", "Madrid", "Dublin", "Zurich"]
_TOOLS = ["search", "calculator", "browser", "sql", "python"]
_FILLER = [
    "let me check that for you",
    "here is what i found so far",
    "could you clarify the request",
    "running the analysis now",
    "that looks correct to me",
    "the results are attached below",
]


def _people(rng: np.random.RandomState, n: int) -> list[str]:
    names = set()
    while len(names) < n:
        names.add(f"{_FIRST[rng.randint(len(_FIRST))]} {_LAST[rng.randint(len(_LAST))]}")
    return sorted(names)


def _orgs(rng: np.random.RandomState, n: int) -> list[str]:
    names = set()
    while len(names) < n:
        stem = _ORG_STEM[rng.randint(len(_ORG_STEM))]
        suf = _ORG_SUFFIX[rng.randint(len(_ORG_SUFFIX))]
        names.add(f"{stem} {suf}".strip())
    return sorted(names)


def _zipf_pick(rng: np.random.RandomState, items: list[str]) -> str:
    # Zipf-skewed index: item 0 is the hot key.
    idx = min(len(items) - 1, rng.zipf(1.3) - 1)
    return items[idx]


def _novelize_text(text: str, conv_id: str, turn_idx: int) -> str:
    """Make every sentence of ``text`` globally unique by injecting a
    deterministic lowercase tag BEFORE the trailing period — inside the
    sentence, so the sentence-level extraction memo (stages/extract.py)
    can never hit, while extraction OUTPUT is unchanged (the tag is
    lowercase: no mention candidate, no predicate).

    This is the worst-case corpus for the memo's 97%-hit assumption
    (VERDICT r2 item 6): a real low-duplication corpus where every
    sentence is novel."""
    if not text or not text.strip():
        return text
    out = []
    for i, sent in enumerate(text.split(rules.SENTENCE_SEP)):
        tag = f" ref {rules.stable_id(conv_id, turn_idx, i)}"
        if sent.endswith("."):
            out.append(sent[:-1] + tag + ".")
        else:
            out.append(sent + tag)
    return rules.SENTENCE_SEP.join(out)


def generate_transcripts(
    num_convs: int = 100,
    turns_per_conv: int = 20,
    seed: int = 42,
    empty_frac: float = 0.03,
    dup_frac: float = 0.02,
    novel_frac: float = 0.0,
) -> pa.Table:
    """Deterministic transcript table (TRANSCRIPT_SCHEMA). Pure fn of args.

    ``novel_frac``: fraction of turns whose sentences get a deterministic
    unique lowercase tag (1.0 = fully low-duplication corpus, the
    sentence-memo worst case). 0.0 (default) leaves output byte-identical
    to earlier rounds."""
    rng = np.random.RandomState(seed)
    people = _people(rng, 40)
    orgs = _orgs(rng, 30)
    preds = list(rules.PREDICATES)

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.int64(1_700_000_000_000_000)  # fixed epoch µs

    for c in range(num_convs):
        conv_id = f"conv-{c:06d}"
        nturns = max(2, int(turns_per_conv * (0.5 + rng.rand())))
        ts = base_ts + np.int64(c) * 10_000_000
        dup_rows: list[int] = []
        for t in range(nturns):
            role = ("user", "assistant", "tool")[
                0 if t % 2 == 0 else (2 if rng.rand() < 0.15 else 1)
            ]
            tool = _TOOLS[rng.randint(len(_TOOLS))] if role == "tool" else None
            r = rng.rand()
            if r < empty_frac:
                text = "" if rng.rand() < 0.5 else "   "
            elif r < 0.55:
                # relation sentence(s): the signal triple extraction recovers
                nsent = 1 + (rng.rand() < 0.3)
                sents = []
                for _ in range(nsent):
                    subj = _zipf_pick(rng, people) if rng.rand() < 0.5 else _zipf_pick(rng, orgs)
                    pred = preds[rng.randint(len(preds))]
                    obj = _zipf_pick(rng, orgs) if rng.rand() < 0.6 else _CITY[rng.randint(len(_CITY))]
                    if subj == obj:
                        obj = _CITY[rng.randint(len(_CITY))]
                    sents.append(f"{subj} {pred} {obj}")
                text = (rules.SENTENCE_SEP.join(sents)) + "."
            elif r < 0.75:
                # mention without relation
                ent = _zipf_pick(rng, people) if rng.rand() < 0.5 else _zipf_pick(rng, orgs)
                text = f"Tell me more about {ent}."
            else:
                text = _FILLER[rng.randint(len(_FILLER))]
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            ts += np.int64(rng.randint(1_000_000, 60_000_000))
            tss.append(ts)
            if rng.rand() < dup_frac:
                dup_rows.append(len(conv_ids) - 1)
        # duplicate re-sends appended at the end of the conversation's rows
        for i in dup_rows:
            conv_ids.append(conv_ids[i])
            turn_idxs.append(turn_idxs[i])
            roles.append(roles[i])
            texts.append(texts[i])
            tools.append(tools[i])
            tss.append(tss[i])

    if novel_frac > 0.0:
        # hash-gated (not rng) so duplicate re-sends of a turn stay exact
        # duplicates of each other and novel_frac=0 stays byte-identical
        texts = [
            _novelize_text(tx, c, t)
            if rules.crc_bucket(f"{c}|{t}|novel", 1000) < novel_frac * 1000
            else tx
            for c, t, tx in zip(conv_ids, turn_idxs, texts)
        ]

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array([int(t) for t in tss], pa.int64()).cast(pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    out_dir: str,
    num_convs: int = 100,
    turns_per_conv: int = 20,
    seed: int = 42,
    num_files: int = 8,
    novel_frac: float = 0.0,
) -> str:
    """Write multi-file Parquet hash-partitioned by conv_id (FIXTURES.md §1).

    Files play the role of Kafka partitions in the reference (S1,
    kafka/client.go:49-92); a conversation never spans files.
    """
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_transcripts(num_convs, turns_per_conv, seed,
                               novel_frac=novel_frac)
    part = np.array([rules.crc_bucket(c, num_files) for c in tbl["conv_id"].to_pylist()])
    for k in range(num_files):
        sub = tbl.filter(pa.array(part == k))
        pq.write_table(sub, os.path.join(out_dir, f"part-{k:05d}.parquet"))
    return out_dir


def transcripts_from_documents(documents: pa.Table) -> pa.Table:
    """Derive a transcript table deterministically from the driver-provided
    `documents` testdata (doc_id, text, ...): one conversation per document,
    one turn per '. '-separated sentence, alternating user/assistant roles.

    SQL-mirrorable (literal string_split + unnest WITH ORDINALITY), which is
    what makes the per-turn text-equality invariant DuckDB-checkable.
    """
    doc_ids = documents["doc_id"].to_pylist()
    doc_texts = documents["text"].to_pylist()
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = 1_700_000_000_000_000
    for doc_id, text in zip(doc_ids, doc_texts):
        parts = (text or "").split(rules.SENTENCE_SEP)
        for i, part in enumerate(parts):
            conv_ids.append(f"doc-{doc_id}")
            turn_idxs.append(i)
            roles.append("user" if i % 2 == 0 else "assistant")
            texts.append(part)
            tools.append(None)
            tss.append(base_ts + doc_id * 1_000_000 + i)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array([int(t) for t in tss], pa.int64()).cast(pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
