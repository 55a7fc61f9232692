"""Batched MinHash / SimHash / LSH band hashing (stages S4–S5).

The graft analog of CDStore's share fingerprints (SURVEY.md §2.A ops 4–5):
deterministic, content-derived fixed-width summaries whose *equality* drives
dedup. Exact SHA-256 equality becomes MinHash-band equality because the
graft must tolerate perturbed near-duplicates, not just byte-identical ones.

All functions operate on a whole batch of clips at once:
shingle hashes for the batch are concatenated into one uint64 array plus an
offsets array (CSR layout), and reductions use np.minimum.reduceat /
np.add.reduceat — zero per-row Python, as the input_hint mandates.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from . import hashing as H

U64 = np.uint64


def minhash_params(cfg: PipelineConfig) -> tuple[np.ndarray, np.ndarray]:
    """k multiply-shift permutation params (A odd, B) — seeds from cfg.seed."""
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(0, 1 << 63, size=cfg.minhash_k, dtype=np.uint64) * U64(2) + U64(1)
    b = rng.integers(0, 1 << 63, size=cfg.minhash_k, dtype=np.uint64)
    return a, b


def _csr_counts(offsets: np.ndarray) -> np.ndarray:
    return offsets[1:] - offsets[:-1]


def minhash_batch(values: np.ndarray, offsets: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """(total_shingles,) uint64 + CSR offsets (n_clips+1,) → (n_clips, k) sigs.

    Empty shingle sets get the sentinel signature (all empty_sentinel) —
    identical sentinels collide in every band, which is exactly how the
    near-silence skew block forms (FIXTURES.md §2).
    """
    a, b = minhash_params(cfg)
    n = offsets.shape[0] - 1
    k = cfg.minhash_k
    sent = U64(cfg.empty_sentinel)
    out = np.full((n, k), sent, dtype=U64)
    if values.shape[0] == 0:
        return out
    # (k, T) orientation: reduceat along axis=1 walks each permutation's
    # row contiguously — measured 8.8x faster than the (T, k) layout's
    # axis-0 reduction (identical values; pure memory-order change)
    hx = values[None, :] * a[:, None] + b[:, None]          # (k, T) wraparound
    counts = _csr_counts(offsets)
    nz = counts > 0
    if not nz.any():
        return out
    # reduceat needs strictly valid start indices; restrict to non-empty rows
    starts = offsets[:-1][nz].astype(np.int64)
    red = np.minimum.reduceat(hx, starts, axis=1)           # (k, nnz)
    out[nz] = red.T
    return out


def simhash_batch(values: np.ndarray, offsets: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """CSR shingle hashes → (n_clips,) uint64 SimHash (0 for empty sets)."""
    n = offsets.shape[0] - 1
    out = np.zeros(n, dtype=U64)
    if values.shape[0] == 0:
        return out
    # (64, T) orientation for the same contiguous-reduceat reason as
    # minhash_batch (identical values)
    bits = ((values[None, :] >> np.arange(64, dtype=U64)[:, None]) & U64(1)).astype(np.int32)
    contrib = bits * 2 - 1                                   # (64, T) in {-1, +1}
    counts = _csr_counts(offsets)
    nz = counts > 0
    if not nz.any():
        return out
    starts = offsets[:-1][nz].astype(np.int64)
    sums = np.add.reduceat(contrib, starts, axis=1)          # (64, nnz)
    packed = ((sums > 0).astype(U64).T
              << np.arange(64, dtype=U64)[None, :]).sum(axis=1, dtype=U64)
    out[nz] = packed
    return out


def band_hashes(sigs: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """(n, k) MinHash sigs → (n, b) uint64 band hashes (b bands × r rows)."""
    n = sigs.shape[0]
    b, r = cfg.lsh_bands, cfg.lsh_rows
    assert b * r == cfg.minhash_k, "bands × rows must equal minhash_k"
    view = sigs.reshape(n, b, r)
    acc = H.mix64(np.full((n, b), np.arange(b, dtype=U64), dtype=U64))
    for j in range(r):
        acc = H.mix2(acc, view[:, :, j])
    return acc


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a XOR b over uint64 arrays."""
    x = (np.asarray(a, U64) ^ np.asarray(b, U64)).view(np.uint8)
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1)
