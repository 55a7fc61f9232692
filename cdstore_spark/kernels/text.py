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


def ngram_shingles(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes (uint64). Shorter texts fall back to the
    whole-text hash so no clip has an empty text shingle set."""
    th = token_hashes(text)
    m = th.shape[0]
    if m == 0:
        return np.empty(0, dtype=U64)
    if m < n:
        acc = th[0]
        for i in range(1, m):
            acc = H.mix2(np.asarray([acc], U64), np.asarray([th[i]], U64))[0]
        return np.asarray([acc], dtype=U64)
    acc = th[: m - n + 1].copy()
    for j in range(1, n):
        acc = H.mix2(acc, th[j: m - n + 1 + j])
    return acc


def char_codes(text: str) -> np.ndarray:
    """Normalized transcript as an int32 codepoint array (suffix-array input)."""
    s = normalize(text)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.int32) if s else np.empty(0, np.int32)
