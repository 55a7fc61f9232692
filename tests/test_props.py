"""Property-based kernel tests (hypothesis): transfer-format roundtrips,
LCS agreement between the hashed and suffix-array constructions, and text
kernel edge cases — the invariants the Arrow/verify hot path rests on.
No Spark session needed; pure NumPy."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdstore_spark.kernels import suffix
from cdstore_spark.kernels import text as K_text
from cdstore_spark.kernels.clipfeat import pack_events, unpack_events

_f32 = st.floats(min_value=-1e6, max_value=1e6, width=32,
                 allow_nan=False, allow_infinity=False)


class TestPackRoundtrip:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 2**31 - 1), _f32, _f32),
                    max_size=400))
    def test_pack_unpack_identity(self, rows):
        ev = np.asarray([r[0] for r in rows], dtype=np.int32)
        ms = np.asarray([r[1] for r in rows], dtype=np.float32)
        zcr = np.asarray([r[2] for r in rows], dtype=np.float32)
        ev2, ms2, zcr2 = unpack_events(pack_events(ev, ms, zcr))
        assert ev2.dtype == np.int64
        assert np.array_equal(ev2, ev.astype(np.int64))
        assert np.array_equal(ms2, ms)
        assert np.array_equal(zcr2, zcr)


class TestLcsProperties:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(0, 5), max_size=80),
           st.lists(st.integers(0, 5), max_size=80))
    def test_hashed_lcs_equals_sa(self, a, b):
        aa = np.asarray(a, dtype=np.int64)
        bb = np.asarray(b, dtype=np.int64)
        L, pa, pb = suffix.longest_common_run(aa, bb)
        L_sa, _, _ = suffix.longest_common_run_sa(aa, bb)
        assert L == L_sa
        if L:
            assert np.array_equal(aa[pa:pa + L], bb[pb:pb + L])
        else:
            assert (pa, pb) == (-1, -1)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(0, 3), min_size=1, max_size=60))
    def test_lcs_self_is_whole_sequence(self, a):
        aa = np.asarray(a, dtype=np.int64)
        L, pa, pb = suffix.longest_common_run(aa, aa)
        assert L == len(a) and pa == 0 and pb == 0


class TestTextKernelEdges:
    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def test_trigrams_and_fingerprints_total(self, s):
        """Never crash on arbitrary unicode; outputs deterministic."""
        t1 = K_text.char_trigram_hashes(s)
        t2 = K_text.char_trigram_hashes(s)
        assert np.array_equal(t1, t2)
        f1 = K_text.winnow_fingerprints(s)
        f2 = K_text.winnow_fingerprints(s)
        assert np.array_equal(f1, f2)
        assert f1.shape[0] <= 16

    def test_lang_scores_empty_cases(self):
        langs, scores = K_text.lang_scores(
            ["", "ab", "the quick brown fox"],
            {"en": np.sort(K_text.char_trigram_hashes("the quick"))})
        assert langs == ["en", "en", "en"]
        assert scores[0] == 0.0 and scores[1] == 0.0 and scores[2] > 0

    def test_lang_scores_no_profiles(self):
        langs, scores = K_text.lang_scores(["abc"], {})
        assert langs == ["und"] and scores[0] == 0.0

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.sampled_from(
        ["", "ab", "the quick brown fox", "x", "hello world text here"]),
        min_size=1, max_size=8))
    def test_lang_scores_empty_docs_any_position(self, texts):
        """Regression: a no-trigram doc at the END of a batch crashed
        reduceat (start index == flat length); empty docs must be safe in
        ANY position and always score 0."""
        prof = {"en": np.sort(K_text.char_trigram_hashes("the quick fox"))}
        langs, scores = K_text.lang_scores(texts, prof)
        assert len(langs) == len(texts)
        for t, s in zip(texts, scores):
            if len(K_text.char_trigram_hashes(t)) == 0:
                assert s == 0.0


class TestResample:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(_f32, max_size=500), st.sampled_from([8000, 16000]),
           st.sampled_from([8000, 16000]))
    def test_resample_length_and_identity(self, x, sr_from, sr_to):
        from cdstore_spark.kernels.codec import resample_linear
        arr = np.asarray(x, dtype=np.float32)
        y = resample_linear(arr, sr_from, sr_to)
        if sr_from == sr_to:
            assert np.array_equal(y, arr)
        elif arr.shape[0]:
            assert y.shape[0] == max(1, round(arr.shape[0]
                                              * sr_to / sr_from))
            # endpoints preserved by linear interpolation (needs >= 2
            # output samples — a length-1 output sits at position 0)
            assert np.isclose(y[0], arr[0], atol=1e-5)
            if y.shape[0] >= 2:
                assert np.isclose(y[-1], arr[-1], atol=1e-5)
        else:
            assert y.shape[0] == 0


class TestVerifyMemo:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.sampled_from(
        ["", "a b", "The  quick fox", "the quick fox", "x" * 40,
         "lorem ipsum dolor", "LOREM ipsum  DOLOR", "päivää ÄÄ",
         "one two three four five six"]), min_size=2, max_size=8))
    def test_text_pair_memo_identical(self, texts):
        """verify_text_pair with a shared memo must equal the memo-free
        path on every pair — including repeated contents (the memo's whole
        point) and hits on both the equal-normalized fast path and the
        suffix LCS path."""
        from cdstore_spark.kernels.clipfeat import verify_text_pair
        memo: dict = {}
        for a in texts:
            for b in texts:
                assert (verify_text_pair(a, b, memo)
                        == verify_text_pair(a, b))
