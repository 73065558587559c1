"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All vectorized per batch; every op is a pure function of the text column and
each has a DuckDB-SQL mirror in __ray_entry__.oracle_sql() (the definitions
below are chosen to be exactly SQL-expressible: whitespace tokenization =
regexp_split_to_array(trim(text), '\\s+'), fingerprint = md5(text), etc.).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS_SPLIT = re.compile(r"\s+")

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": frozenset("the and of to a in is it you that for on with as are was".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit für auf".split()),
    "fr": frozenset("le la les et de un une est pour dans que sur avec".split()),
    "es": frozenset("el la los las y de un una es para en que con por".split()),
}
EN_STOPWORDS = tuple(sorted(STOPWORDS["en"]))


def _tokens(text: str | None) -> list[str]:
    """Whitespace tokens — mirrors regexp_split_to_array(trim(x), '\\s+')."""
    if text is None:
        return []
    t = text.strip()
    return _WS_SPLIT.split(t) if t else []


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "n_tokens") -> pa.Table:
    counts = [len(_tokens(t)) for t in batch[col].to_pylist()]
    return batch.append_column(out, pa.array(counts, pa.int64()))


def add_quality_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """n_chars_txt, n_tokens, sum_token_len — all integers, so the DuckDB
    oracle matches EXACTLY (no float-rounding-mode divergence; consumers
    derive avg_token_len = sum_token_len / n_tokens themselves)."""
    texts = batch[col].to_pylist()
    n_chars, n_toks, tot_len = [], [], []
    for t in texts:
        toks = _tokens(t)
        n_chars.append(len(t) if t is not None else 0)
        n_toks.append(len(toks))
        tot_len.append(sum(len(x) for x in toks))
    batch = batch.append_column("n_chars_txt", pa.array(n_chars, pa.int64()))
    batch = batch.append_column("n_tokens", pa.array(n_toks, pa.int64()))
    return batch.append_column("sum_token_len", pa.array(tot_len, pa.int64()))


def add_stopword_count(batch: pa.Table, col: str = "text",
                       out: str = "n_stopwords") -> pa.Table:
    """Count of lowercase whitespace tokens in the English stopword list —
    integer-exact language-ID building block (SQL: list_filter lambda);
    ratio = n_stopwords / n_tokens is left to the consumer."""
    sw = STOPWORDS["en"]
    counts = []
    for t in batch[col].to_pylist():
        toks = _tokens(t.lower() if t else t)
        counts.append(sum(1 for x in toks if x in sw))
    return batch.append_column(out, pa.array(counts, pa.int64()))


def add_lang_guess(batch: pa.Table, col: str = "text",
                   out: str = "lang_guess") -> pa.Table:
    """Stopword-vote language heuristic over {en,de,fr,es}; 'und' (undetermined)
    when no stopword hits. Not SQL-mirrored (rows-only check)."""
    langs = sorted(STOPWORDS)
    out_l = []
    for t in batch[col].to_pylist():
        toks = _tokens(t.lower() if t else t)
        scores = {lg: sum(1 for x in toks if x in STOPWORDS[lg]) for lg in langs}
        best = max(langs, key=lambda lg: (scores[lg], lg))
        out_l.append(best if scores[best] > 0 else "und")
    return batch.append_column(out, pa.array(out_l, pa.string()))


def add_md5_fingerprint(batch: pa.Table, col: str = "text",
                        out: str = "fp") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (SQL: md5(text))."""
    fps = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in batch[col].to_pylist()
    ]
    return batch.append_column(out, pa.array(fps, pa.string()))


def rolling_fingerprints(text: str, window: int = 16, keep_every: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: rolling 64-bit hash over
    character windows, keeping every ``keep_every``-th minimum. Deterministic;
    used by near-dup diagnostics (rows-only)."""
    if not text or len(text) < window:
        return []
    b = text.encode(errors="ignore")
    mask = (1 << 61) - 1
    base = 257
    h = 0
    pw = pow(base, window - 1, mask)
    out = []
    for i, c in enumerate(b):
        h = (h * base + c) % mask
        if i >= window:
            h = (h - b[i - window] * pw * base) % mask
        if i >= window - 1 and (i % keep_every) == 0:
            out.append(h)
    return out
