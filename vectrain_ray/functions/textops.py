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
import pyarrow.compute as pc

_WS_SPLIT = re.compile(r"\s+")

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": frozenset("the and of to a in is it you that for on with as are was".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit für auf".split()),
    "fr": frozenset("le la les et de un une est pour dans que sur avec".split()),
    "es": frozenset("el la los las y de un una es para en que con por".split()),
}
EN_STOPWORDS = tuple(sorted(STOPWORDS["en"]))


_LANGS = sorted(STOPWORDS)  # de, en, es, fr
_VOCAB_ARR = {lg: pa.array(sorted(STOPWORDS[lg])) for lg in _LANGS}


def _tokens(text: str | None) -> list[str]:
    """Whitespace tokens — mirrors regexp_split_to_array(trim(x), '\\s+').
    (Reference implementation; the batch ops below express the same thing in
    Arrow C++ — split_pattern_regex uses the SAME RE2 engine as DuckDB.)"""
    if text is None:
        return []
    t = text.strip()
    return _WS_SPLIT.split(t) if t else []


def _trimmed(batch: pa.Table, col: str, lower: bool = False):
    txt = pc.fill_null(batch[col], "")
    if lower:
        txt = pc.utf8_lower(txt)
    return pc.utf8_trim_whitespace(txt)


def _split_ws(trimmed) -> pa.ListArray:
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def _ntokens(trimmed, toks) -> pa.Array:
    """split('') yields [''] — the empty-after-trim rows must count 0."""
    n = pc.list_value_length(toks)
    return pc.cast(
        pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n),
        pa.int64(),
    )


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "n_tokens") -> pa.Table:
    trimmed = _trimmed(batch, col)
    return batch.append_column(out, _ntokens(trimmed, _split_ws(trimmed)))


def add_quality_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """n_chars_txt, n_tokens, sum_token_len — all integers, so the DuckDB
    oracle matches EXACTLY (no float-rounding-mode divergence; consumers
    derive avg_token_len = sum_token_len / n_tokens themselves). All three
    are Arrow C++ kernels: utf8_length, split_pattern_regex,
    replace_substring_regex — no per-row Python."""
    filled = pc.fill_null(batch[col], "")
    trimmed = pc.utf8_trim_whitespace(filled)
    toks = _split_ws(trimmed)
    n_chars = pc.cast(pc.utf8_length(filled), pa.int64())
    n_toks = _ntokens(trimmed, toks)
    # sum of token lengths == length after deleting ALL whitespace
    tot = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(filled, pattern=r"\s",
                                                  replacement="")),
        pa.int64(),
    )
    batch = batch.append_column("n_chars_txt", n_chars)
    batch = batch.append_column("n_tokens", n_toks)
    return batch.append_column("sum_token_len", tot)


def _vocab_hits(toks: pa.ListArray, n_rows: int, vocab: pa.Array) -> np.ndarray:
    """Per-row count of tokens ∈ vocab: flatten + is_in + bincount (all
    vectorized; the '' token from empty rows never matches)."""
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    hit = pc.is_in(flat, value_set=vocab)
    par = parents.to_numpy(zero_copy_only=False)
    h = hit.to_numpy(zero_copy_only=False).astype(bool)
    return np.bincount(par[h], minlength=n_rows).astype(np.int64)


def add_stopword_count(batch: pa.Table, col: str = "text",
                       out: str = "n_stopwords") -> pa.Table:
    """Count of lowercase whitespace tokens in the English stopword list —
    integer-exact language-ID building block (SQL: list_filter lambda);
    ratio = n_stopwords / n_tokens is left to the consumer."""
    toks = _split_ws(_trimmed(batch, col, lower=True))
    counts = _vocab_hits(toks, batch.num_rows, _VOCAB_ARR["en"])
    return batch.append_column(out, pa.array(counts, pa.int64()))


def add_lang_guess(batch: pa.Table, col: str = "text",
                   out: str = "lang_guess") -> pa.Table:
    """Stopword-vote language heuristic over {en,de,fr,es}; 'und' when no
    stopword hits. Ties break to the lexicographically LAST language among
    the tied (mirrored exactly by the SQL oracle's ordered CASE chain)."""
    toks = _split_ws(_trimmed(batch, col, lower=True))
    scores = np.stack(
        [_vocab_hits(toks, batch.num_rows, _VOCAB_ARR[lg]) for lg in _LANGS]
    )  # (n_langs, n_rows), lang order = sorted asc
    rev = scores[::-1]  # argmax picks FIRST max → reverse = last-of-ties
    arg = rev.argmax(axis=0)
    best = np.array(_LANGS[::-1], dtype=object)[arg]
    best[rev.max(axis=0) == 0] = "und"
    return batch.append_column(out, pa.array(best.tolist(), pa.string()))


def add_md5_fingerprint(batch: pa.Table, col: str = "text",
                        out: str = "fp") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (SQL: md5(text))."""
    fps = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in batch[col].to_pylist()
    ]
    return batch.append_column(out, pa.array(fps, pa.string()))


def rolling_fingerprints(text: str, window: int = 16,
                         keep_every: int = 8) -> list[int]:
    """TRUE winnowing document fingerprint (Schleimer et al.): rolling
    61-bit hash over byte ``window``s, then keep the MINIMUM hash of every
    ``keep_every``-length window of consecutive hashes (rightmost min on
    ties), deduplicating consecutive repeats. Winnowing minima — unlike
    the earlier every-k-th-POSITION sampling — survive insertions: an edit
    shifts positions but local minima re-align, so near-dup diagnostics
    still match shifted duplicates. Deterministic; rows-only (no oracle).
    Length guards count BYTES (hashing iterates the encoded bytes, so a
    short string of wide codepoints can still hold full windows)."""
    if not text:
        return []
    b = text.encode(errors="ignore")
    if len(b) < window:
        return []
    mask = (1 << 61) - 1
    base = 257
    h = 0
    pw = pow(base, window - 1, mask)
    hashes = []
    for i, c in enumerate(b):
        h = (h * base + c) % mask
        if i >= window:
            h = (h - b[i - window] * pw * base) % mask
        if i >= window - 1:
            hashes.append(h)
    hs = np.asarray(hashes, dtype=np.int64)
    if len(hs) <= keep_every:
        return [int(hs.min())]
    sw = np.lib.stride_tricks.sliding_window_view(hs, keep_every)
    # rightmost minimum per window: argmin on the reversed window
    mins = sw.min(axis=1)
    out = [int(mins[0])]
    for m in mins[1:].tolist():
        if m != out[-1]:
            out.append(m)
    return out
