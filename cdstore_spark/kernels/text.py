"""Transcript normalization + word-n-gram shingling (text channel of S3).

The transcript channel mirrors the audio CDC channel: a deterministic
shingle set per clip, fed to the same MinHash/LSH machinery. Word n-grams
(FIXTURES.md §4: 3-grams) rather than CDC because transcripts are short
token sequences where n-grams are the standard near-dup shingle.
"""

from __future__ import annotations

import hashlib

import numpy as np

from . import hashing as H

U64 = np.uint64

# process-stable memoized token hashing; vocab is small (FIXTURES.md: 512
# words) so the cache makes token hashing O(unique tokens) per batch.
_TOKEN_CACHE: dict[str, int] = {}


def normalize(text: str) -> str:
    """Lowercase + whitespace-collapse. Deterministic, locale-free."""
    return " ".join(text.lower().split()) if text else ""


def token_hash(tok: str) -> int:
    h = _TOKEN_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")
        _TOKEN_CACHE[tok] = h
    return h


def token_hashes(text: str) -> np.ndarray:
    toks = normalize(text).split()
    return np.fromiter((token_hash(t) for t in toks), dtype=U64, count=len(toks))


def _grams(th: np.ndarray, n: int) -> np.ndarray:
    m = th.shape[0]
    if m < n:
        return np.empty(0, dtype=U64)
    acc = H.mix2(th[: m - n + 1], np.full(m - n + 1, n, dtype=U64))
    for j in range(1, n):
        acc = H.mix2(acc, th[j: m - n + 1 + j])
    return acc


def ngram_shingles(text: str, n: int = 3, short_tokens: int = 12) -> np.ndarray:
    """Word n-gram shingle hashes (uint64).

    Transcripts with < short_tokens tokens additionally emit 1- and 2-gram
    shingles (n-gram order is mixed into each hash so orders don't collide):
    one token edit on a short transcript destroys most 3-grams and drops
    Jaccard below the LSH catch curve — the multi-resolution set keeps
    short near-duplicates above it. Texts shorter than n fall back to the
    longest gram available so no clip has an empty text shingle set.
    """
    th = token_hashes(text)
    m = th.shape[0]
    if m == 0:
        return np.empty(0, dtype=U64)
    if m < n:
        return np.unique(np.concatenate([_grams(th, k) for k in range(1, m + 1)]))
    out = _grams(th, n)
    if m < short_tokens:
        out = np.concatenate([_grams(th, 1), _grams(th, 2), out])
    return np.unique(out)


def codes_from_normalized(s: str) -> np.ndarray:
    """int32 codepoint array of an ALREADY-normalized string — split out so
    callers that memoize normalize() don't re-normalize to get codes."""
    return (np.frombuffer(s.encode("utf-32-le"), dtype=np.int32)
            if s else np.empty(0, np.int32))


def char_codes(text: str) -> np.ndarray:
    """Normalized transcript as an int32 codepoint array (suffix-array input)."""
    return codes_from_normalized(normalize(text))


def char_trigram_hashes(text: str) -> np.ndarray:
    """Rolling hash of every 3-char window of the normalized text (uint64).

    The shared primitive under both language-ID profile building and
    scoring — Spark workers and the single-node golden mirror call this
    exact function, so their trigram universes agree bit-for-bit.
    """
    codes = char_codes(text)
    if codes.shape[0] < 3:
        return np.empty(0, dtype=U64)
    return H.window_hashes(codes.astype(U64), 3)


def lang_scores(texts, profiles: dict[str, np.ndarray]
                ) -> tuple[list[str], np.ndarray]:
    """Vectorized language-ID scoring against per-language trigram profiles.

    profiles: lang -> SORTED uint64 array of that language's top trigram
    hashes. Score(doc, lang) = |doc's distinct trigrams ∩ profile| /
    |doc's distinct trigrams| (0 when the doc has no trigrams). Winner =
    max score, ties broken by lexicographic lang. One searchsorted pass
    per language over the whole batch — no per-document Python in the
    scoring loop.
    """
    tris = [np.unique(char_trigram_hashes(str(t))) for t in texts]
    if not profiles:
        return (["und"] * len(tris),
                np.zeros(len(tris), dtype=np.float64))
    counts = np.array([a.shape[0] for a in tris], dtype=np.int64)
    flat = np.concatenate(tris) if tris else np.empty(0, dtype=U64)
    offs = np.zeros(len(tris) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    # reduceat needs strictly valid start indices: restrict to non-empty
    # docs (a trailing empty doc would pass start == len(flat) and raise)
    nz = counts > 0
    starts = offs[:-1][nz]
    langs = sorted(profiles)
    scores = np.zeros((len(tris), len(langs)), dtype=np.float64)
    for j, lg in enumerate(langs):
        prof = profiles[lg]
        if prof.shape[0] == 0 or flat.shape[0] == 0 or not nz.any():
            continue
        pos = np.searchsorted(prof, flat)
        hit = (pos < prof.shape[0]) & (prof[np.minimum(pos, prof.shape[0] - 1)]
                                       == flat)
        hits_nz = np.add.reduceat(hit.astype(np.int64), starts)
        hits_per_doc = np.zeros(len(tris), dtype=np.int64)
        hits_per_doc[nz] = hits_nz
        scores[:, j] = hits_per_doc / np.maximum(counts, 1)
    best = scores.argmax(axis=1) if langs else np.zeros(len(tris), np.int64)
    return [langs[i] for i in best], scores[np.arange(len(tris)), best]


def winnow_fingerprints(text: str, window: int = 8, keep: int = 16
                        ) -> np.ndarray:
    """Winnowing-style fingerprints: rolling hash over char 4-grams, the
    `keep` smallest distinct window minima, as SORTED int64. Shared by the
    Spark operator and the golden mirror."""
    codes = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.int32)
    if codes.shape[0] < 4:
        return np.empty(0, dtype=np.int64)
    wh = H.window_hashes(codes.astype(U64), 4)
    if wh.shape[0] >= window:
        view = np.lib.stride_tricks.sliding_window_view(wh, window)
        mins = np.unique(view.min(axis=1))
    else:
        mins = np.unique(wh)
    return np.sort(mins)[:keep].view(np.int64)
