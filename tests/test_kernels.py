"""Kernel unit tests — bit-exact, no Spark (fast tier, SURVEY.md §5.2.1)."""

from __future__ import annotations

import numpy as np
import pytest

from cdstore_spark.config import DEFAULT as CFG
from cdstore_spark.kernels import codec, features, hashing, sketch, suffix, text, unionfind


def _sine(sr=16000, dur_s=1.0, freqs=(440.0, 1333.0), amps=(0.6, 0.2)):
    t = np.arange(int(sr * dur_s)) / sr
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    return (x / np.max(np.abs(x)) * 0.7).astype(np.float32)


class TestCodec:
    @pytest.mark.parametrize("c", codec.CODECS)
    def test_roundtrip_snr_above_30db(self, c):
        x = _sine()
        y = codec.decode_float(codec.encode(x, c), c)
        err = x - y
        snr = 10 * np.log10(np.sum(x**2) / max(np.sum(err**2), 1e-30))
        assert snr >= 30.0, f"{c}: snr {snr:.1f} dB"
        assert len(y) == len(x)

    def test_g711_full_range_monotone_magnitude(self):
        i16 = np.arange(-32768, 32768, dtype=np.int16)
        for enc, lut in [(codec._ulaw_encode_i16, codec.ULAW_LUT),
                         (codec._alaw_encode_i16, codec.ALAW_LUT)]:
            dec = lut[enc(i16)].astype(np.int64)
            err = np.abs(i16.astype(np.int64) - dec)
            assert err.max() < 1024  # worst-case top-segment quantization

    def test_n_samples(self):
        assert codec.n_samples(100, "pcm_s16le") == 50
        assert codec.n_samples(100, "ulaw") == 100

    def test_independent_g711_tables_match_kernel_luts(self):
        """The from-scratch spec-derived decode tables that back the
        streaming contract golden (golden_funcs._indep_*_table) must
        equal the kernel LUTs on ALL 256 codes — including the
        encoder-unreachable A-law seg-7 codes, where the independent
        table's mod-2^16 wrap mirrors the kernel's int16 cast."""
        from cdstore_spark.golden_funcs import (_indep_alaw_table,
                                                _indep_ulaw_table)
        assert np.array_equal(
            np.asarray(_indep_ulaw_table(), dtype=np.int16), codec.ULAW_LUT)
        assert np.array_equal(
            np.asarray(_indep_alaw_table(), dtype=np.int16), codec.ALAW_LUT)


class TestHashing:
    def test_span_hash_shift_invariant(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, 500, dtype=np.uint64)
        shifted = np.concatenate([rng.integers(0, 255, 37, dtype=np.uint64), x])
        p1, p2 = hashing.poly_prefix(x), hashing.poly_prefix(shifted)
        i1 = hashing.poly_inv_powers(len(x) + 1)
        i2 = hashing.poly_inv_powers(len(shifted) + 1)
        h1 = hashing.span_hashes(p1, i1, np.array([10]), np.array([60]))
        h2 = hashing.span_hashes(p2, i2, np.array([47]), np.array([97]))
        assert h1[0] == h2[0]

    def test_window_hashes_match_bruteforce(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 1 << 62, 64, dtype=np.uint64)
        w = 5
        wh = hashing.window_hashes(x, w)
        for i in [0, 10, 59]:
            expected = hashing.window_hashes(x[i:i + w], w)[0]
            assert wh[i] == expected


class TestSuffix:
    def test_hashed_lcs_matches_suffix_array(self):
        """The hot-path binary-search LCS must agree with the suffix-array
        construction on length, and return a genuine common run."""
        rng = np.random.default_rng(7)
        for _ in range(200):
            a = rng.integers(0, 6, rng.integers(0, 120))
            b = rng.integers(0, 6, rng.integers(0, 120))
            L, pa, pb = suffix.longest_common_run(a, b)
            L_sa, _, _ = suffix.longest_common_run_sa(a, b)
            assert L == L_sa
            if L:
                assert np.array_equal(a[pa:pa + L], b[pb:pb + L])

    def test_lcs_min_len_floor_semantics(self):
        """min_len changes probe count, never the answer: for runs >=
        min_len the triple is identical to the unfloored search; for runs
        below it the call must report (0, -1, -1) — exactly the collapse
        verify_audio_pair applies anyway."""
        rng = np.random.default_rng(11)
        for _ in range(300):
            a = rng.integers(0, 5, rng.integers(0, 100))
            b = rng.integers(0, 5, rng.integers(0, 100))
            L, pa, pb = suffix.longest_common_run(a, b)
            for k in (1, 2, 3, 7, 50):
                Lk, pak, pbk = suffix.longest_common_run(a, b, min_len=k)
                if L >= k:
                    assert (Lk, pak, pbk) == (L, pa, pb)
                else:
                    assert (Lk, pak, pbk) == (0, -1, -1)

    def test_lcs_vs_bruteforce(self):
        rng = np.random.default_rng(2)
        for _ in range(100):
            a = rng.integers(0, 4, rng.integers(0, 25))
            b = rng.integers(0, 4, rng.integers(0, 25))
            L, pa, pb = suffix.longest_common_run(a, b)
            best = 0
            for i in range(len(a)):
                for j in range(len(b)):
                    k = 0
                    while (i + k < len(a) and j + k < len(b)
                           and a[i + k] == b[j + k]):
                        k += 1
                    best = max(best, k)
            assert L == best
            if L:
                assert np.array_equal(a[pa:pa + L], b[pb:pb + L])


class TestSketch:
    def test_minhash_estimates_jaccard(self):
        rng = np.random.default_rng(3)
        s1 = rng.integers(0, 1 << 62, 400, dtype=np.uint64)
        s2 = np.concatenate([s1[:300],
                             rng.integers(0, 1 << 62, 100, dtype=np.uint64)])
        vals = np.concatenate([s1, s2])
        offs = np.array([0, 400, 800])
        sig = sketch.minhash_batch(vals, offs, CFG)
        est = float((sig[0] == sig[1]).mean())
        true_j = 300 / 500
        assert abs(est - true_j) < 0.15

    def test_empty_set_sentinel(self):
        v = np.arange(10, dtype=np.uint64)
        sig = sketch.minhash_batch(v, np.array([0, 0, 10, 10]), CFG)
        sent = np.uint64(CFG.empty_sentinel)
        assert (sig[0] == sent).all() and (sig[2] == sent).all()
        assert not (sig[1] == sent).all()

    def test_band_equality_iff_slot_equality(self):
        rng = np.random.default_rng(4)
        sig = rng.integers(0, 1 << 62, (2, CFG.minhash_k), dtype=np.uint64)
        sig[1, :40] = sig[0, :40]
        bh = sketch.band_hashes(sig, CFG)
        eq_rows = (sig[0].reshape(CFG.lsh_bands, CFG.lsh_rows)
                   == sig[1].reshape(CFG.lsh_bands, CFG.lsh_rows)).all(axis=1)
        assert ((bh[0] == bh[1]) == eq_rows).all()

    def test_hamming(self):
        a = np.array([0], dtype=np.uint64)
        b = np.array([0xFF], dtype=np.uint64)
        assert sketch.hamming64(a, b)[0] == 8


class TestFeatures:
    def test_silence_has_no_events(self):
        x = (np.random.default_rng(5).normal(0, 0.005, 16000)
             .astype(np.float32))
        syms, ms, zcr = features.audio_events(x, 16000, CFG)
        assert syms.shape[0] == 0

    def test_events_shift_invariant_middle(self):
        x = _sine(dur_s=2.0)
        s1, m1, _ = features.audio_events(x, 16000, CFG)
        s2, m2, _ = features.audio_events(x[777:], 16000, CFG)
        # trimmed clip's events must overlap heavily with the original's
        run, _, _ = suffix.longest_common_run(s1.astype(np.int64),
                                              s2.astype(np.int64))
        assert run >= 0.7 * min(len(s1), len(s2))

    def test_cdc_bounds(self):
        rng = np.random.default_rng(6)
        syms = rng.integers(0, 300, 500).astype(np.uint16)
        offs = features.cdc_boundaries(syms, CFG)
        lens = np.diff(offs)
        assert offs[0] == 0 and offs[-1] == 500
        assert (lens[:-1] >= CFG.cdc_min).all()
        assert (lens <= CFG.cdc_max).all()

    def test_gain_invariance(self):
        x = _sine()
        s1 = features.audio_shingles(features.audio_events(x, 16000, CFG)[0], CFG)
        s2 = features.audio_shingles(
            features.audio_events(x * 0.8, 16000, CFG)[0], CFG)
        inter = len(np.intersect1d(s1, s2))
        assert inter / max(len(s1), 1) > 0.9


class TestText:
    def test_ngrams_deterministic_and_order_mixed(self):
        a = text.ngram_shingles("one two three four", 3, short_tokens=0)
        b = text.ngram_shingles("one two three four", 3, short_tokens=0)
        assert np.array_equal(a, b)
        assert len(a) == 2
        # 1-gram and 3-gram of same token must not collide
        s_short = text.ngram_shingles("one", 3)
        assert not np.intersect1d(a, s_short).size

    def test_short_text_augmentation(self):
        s = text.ngram_shingles("a b c d", 3, short_tokens=12)
        # 4 x 1-grams + 3 x 2-grams + 2 x 3-grams
        assert len(s) == 9


class TestUnionFind:
    def test_components_min_root(self):
        comp = unionfind.components(
            [("b", "c"), ("a", "b"), ("x", "y"), ("y", "z")],
            ["a", "b", "c", "x", "y", "z", "w"])
        assert comp == {"a": "a", "b": "a", "c": "a",
                        "x": "x", "y": "x", "z": "x", "w": "w"}
