"""Robust audio feature extraction + content-defined shingling (stages S2–S3).

Graft of CDStore's variable-size CDC chunker (SURVEY.md §2.A op 3 — Rabin
rolling hash with min/avg/max bounds) onto decoded audio:

1.  |PCM| → moving-average envelope (noise-robust), decimated to ~1 kHz so
    features are sample-rate independent,
2.  peak-normalized (gain-invariant) and sqrt-compand-quantized to a small
    level alphabet, median-filtered to kill isolated noise flips,
3.  run-length encoded into *events* (level, duration) — shift-invariant, so
    trim/pad perturbations realign,
4.  a polynomial rolling hash over the event symbols picks content-defined
    segment boundaries (window/mask/magic/min/max from PipelineConfig — the
    direct analog of the reference's chunker parameters),
5.  each segment's shift-invariant content hash is a *shingle*; the shingle
    set feeds MinHash/SimHash (sketch.py).

Everything is vectorized NumPy per clip; callers batch clips per Arrow batch.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from . import hashing as H

U64 = np.uint64


def smooth_envelope(x: np.ndarray, sr_hz: int, cfg: PipelineConfig) -> np.ndarray:
    """Moving-average of |x| over ~env_smooth_ms at ~env_rate_hz ticks.

    Implemented as per-block |x| sums (np.add.reduceat at the envelope
    tick D = sr/env_rate) + a k-block rolling sum, NOT a per-sample
    float64 cumsum: the full-rate formulation streams ~30 B/sample and
    saturates memory bandwidth long before 32 cores are busy (measured:
    8→32-core scaling collapsed to 2.5x); the block form touches each
    sample once.
    """
    n = x.shape[0]
    d = max(1, sr_hz // cfg.env_rate_hz)                  # samples per tick
    k = max(1, round(cfg.env_smooth_ms * sr_hz / 1000 / d))  # ticks per window
    nb = n // d
    if nb < k + 2:
        return np.empty(0, dtype=np.float32)
    starts = np.arange(0, nb * d, d)
    block_sums = np.add.reduceat(np.abs(x[:nb * d]), starts)
    c = np.concatenate(([0.0], np.cumsum(block_sums, dtype=np.float64)))
    return ((c[k:] - c[:-k]) * (1.0 / (k * d))).astype(np.float32)


def _median_filter(q: np.ndarray, width: int) -> np.ndarray:
    if width <= 1 or q.shape[0] <= width:
        return q
    pad = width // 2
    qp = np.pad(q, pad, mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(qp, width)
    # median of an ODD-width integer window = the middle order statistic:
    # np.partition (introselect) returns it bit-identically to np.median's
    # sort+float path, ~1.6x faster and without the float round-trip
    return np.partition(win, pad, axis=1)[:, pad]


def audio_events(x: np.ndarray, sr_hz: int, cfg: PipelineConfig
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """float PCM → (event symbols uint16[], durations ms float64[],
    per-event log2 zero-crossing-rate float32[]).

    The ZCR track is NOT part of the shingle symbol (keeps MinHash recall
    under additive noise); it is used by the verify stage as a carrier-
    frequency consistency check over the matched event run, rejecting
    unrelated clips whose quantized *envelopes* coincide by chance.

    Silence clips (envelope peak < silence_floor) return empty arrays →
    empty shingle set → sentinel MinHash signature → they all collide in
    every LSH band, forming the designed skew block (FIXTURES.md §2).
    """
    empty = (np.empty(0, np.uint16), np.empty(0, np.float64), np.empty(0, np.float32))
    env = smooth_envelope(x, sr_hz, cfg)
    if env.shape[0] == 0:
        return empty
    peak = float(env.max())
    if peak < cfg.silence_floor:
        return empty
    q = np.sqrt(env * (1.0 / peak))
    q = np.minimum((q * cfg.env_levels).astype(np.int16), cfg.env_levels - 1)
    q = _median_filter(q, cfg.env_median)

    # run-length encode
    change = np.flatnonzero(np.diff(q)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [q.shape[0]]))
    levels = q[starts].astype(np.uint16)

    step = max(1, sr_hz // cfg.env_rate_hz)
    ms_per_env = 1000.0 * step / sr_hz
    dur_ms = (ends - starts).astype(np.float64) * ms_per_env

    log_base = np.log(cfg.dur_log_base)
    dur_bucket = np.floor(np.log(np.maximum(dur_ms, 1.0)) / log_base).astype(np.uint16)
    symbols = (levels << np.uint16(5)) | np.minimum(dur_bucket, np.uint16(31))

    # per-event zero-crossing rate (Hz, log2): crossings are counted per
    # envelope tick (one reduceat pass over the flip bitmap), then prefix-
    # summed at tick granularity — events are tick-aligned by construction
    nb = env.shape[0] + 0  # env length = nb - k + 1; ticks available:
    sign = np.signbit(x)
    flips = (sign[1:] != sign[:-1])
    n_tick = flips.shape[0] // step
    if n_tick < 1:
        return empty
    tick_starts = np.arange(0, n_tick * step, step)
    per_tick = np.add.reduceat(flips[: n_tick * step].astype(np.int32),
                               tick_starts)
    zc_prefix = np.concatenate(([0], np.cumsum(per_tick)))
    lo = np.minimum(starts, n_tick)
    hi = np.minimum(ends, n_tick)
    crossings = (zc_prefix[hi] - zc_prefix[lo]).astype(np.float64)
    secs = np.maximum(hi - lo, 1).astype(np.float64) * step / sr_hz
    zcr_log2 = np.log2(np.maximum(crossings / secs, 1.0)).astype(np.float32)
    return symbols, dur_ms, zcr_log2


def _enforce_bounds(cands: np.ndarray, n: int, lo: int, hi: int) -> np.ndarray:
    """Greedy min/max clamping of CDC boundary candidates (same as the
    reference chunker's min/avg/max semantics). Returns cut positions
    strictly inside (0, n); segment k spans [cuts[k-1], cuts[k])."""
    cuts = []
    last = 0
    i = 0
    m = cands.shape[0]
    while last + lo < n:
        # next candidate at or beyond last+lo
        while i < m and cands[i] < last + lo:
            i += 1
        if i < m and cands[i] <= last + hi:
            cut = int(cands[i])
            i += 1
        else:
            cut = min(last + hi, n)
        if cut >= n:
            break
        cuts.append(cut)
        last = cut
    return np.asarray(cuts, dtype=np.int64)


def cdc_boundaries(symbols: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """Content-defined segment boundaries over the event-symbol stream.

    Returns offsets [0, c1, ..., n]; boundary after position i when the
    rolling hash of the trailing cdc_window symbols satisfies
    (h & cdc_mask) == cdc_magic, clamped to [cdc_min, cdc_max].
    """
    n = symbols.shape[0]
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    wh = H.window_hashes(H.mix64(symbols.astype(U64)), cfg.cdc_window)
    mask, magic = U64(cfg.cdc_mask), U64(cfg.cdc_magic)
    # window ending at position i (inclusive) starts at i - W + 1
    hits = np.flatnonzero((wh & mask) == magic) + cfg.cdc_window  # cut AFTER window
    cuts = _enforce_bounds(hits, n, cfg.cdc_min, cfg.cdc_max)
    return np.concatenate(([0], cuts, [n]))


def audio_shingles(symbols: np.ndarray, cfg: PipelineConfig) -> np.ndarray:
    """Shift-invariant content hashes of CDC segments → the shingle set."""
    if symbols.shape[0] == 0:
        return np.empty(0, dtype=U64)
    offs = cdc_boundaries(symbols, cfg)
    mixed = H.mix64(symbols.astype(U64))
    prefix = H.poly_prefix(mixed)
    inv = H.poly_inv_powers(symbols.shape[0] + 1)
    return H.span_hashes(prefix, inv, offs[:-1], offs[1:])


def frame_rms_peak(x: np.ndarray, sr_hz: int, frame_ms: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-frame RMS + peak of decoded PCM (rounded 6 dp) — the shared
    kernel under frame-sampling feature extraction (Spark operator and
    golden mirror call the same function)."""
    flen = max(1, int(sr_hz) * frame_ms // 1000)
    nfr = x.shape[0] // flen
    if nfr == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    fr = x[: nfr * flen].reshape(nfr, flen).astype(np.float64)
    return (np.sqrt((fr ** 2).mean(axis=1)).round(6),
            np.abs(fr).max(axis=1).round(6))
