"""Frozen golden outputs for operators with no SQL-expressible oracle.

Extends the golden-artifact pattern of golden.py (frozen single-node NumPy
mirrors, read by DuckDB via read_parquet) to the training-data-pipeline
operators that round 1 left rows-only checked: skew stats, frame features,
the image-stub summary, SimHash pairs, winnowing fingerprints, language ID
and the bucketed-ANN probe. Every mirror here calls the SAME shared kernels
as the Spark operator (cdstore_spark/kernels), computed single-node over
pandas — the contract row then proves distributed == single-node exactly,
the same gate the audio pipeline uses.

Artifacts live in data/func_correctness/ (gitignored, regenerated
deterministically; marker _FUNC_GOLDEN_DONE.json carries a VERSION that is
bumped whenever a mirrored operator's semantics change).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import golden, oracle
from .config import DEFAULT, PipelineConfig

VERSION = 8
FUNC_DIR = os.path.join(golden.DATA_ROOT, "func_correctness")
#: the driver grades at sf0.01 — goldens are frozen against that tier
SF_DIR = "/root/testdata/sf0.01"
#: deterministic clip subset used by the frame/image queries (ids 0..199)
CLIP_SUBSET_MAX = "clip_00000200"


def path(name: str) -> str:
    return os.path.join(FUNC_DIR, name)


def _write(pdf: pd.DataFrame, name: str) -> None:
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   path(name), row_group_size=4096)


def _expected_skew_stats(clips: pd.DataFrame, cfg: PipelineConfig
                         ) -> pd.DataFrame:
    from .kernels.clipfeat import featurize_batch
    parts = []
    for s in range(0, len(clips), 512):
        parts.append(featurize_batch(clips.iloc[s: s + 512], cfg))
    feats = pd.concat(parts, ignore_index=True)
    return oracle.skew_stats_from_feats(feats, cfg)


def _expected_frame_features(clips: pd.DataFrame) -> pd.DataFrame:
    from .kernels import codec as K_codec
    from .kernels import features as K_feat
    sub = clips[clips["clip_id"] < CLIP_SUBSET_MAX]
    recs = []
    for cid, raw, sr, codec in zip(sub["clip_id"], sub["bytes"],
                                   sub["sr_hz"], sub["codec"]):
        x = K_codec.decode_float(raw, str(codec))
        rms, peak = K_feat.frame_rms_peak(x, int(sr), 100)
        for k in range(rms.shape[0]):
            recs.append((cid, k, float(rms[k]), float(peak[k])))
    return pd.DataFrame(recs, columns=["clip_id", "frame_idx",
                                       "frame_rms", "frame_peak"])


def _expected_image_stub(clips: pd.DataFrame) -> pd.DataFrame:
    from .functions.multimodal import image_summary_record
    sub = clips[clips["clip_id"] < CLIP_SUBSET_MAX]
    recs = [(cid, *image_summary_record(bytes(raw)))
            for cid, raw in zip(sub["clip_id"], sub["bytes"])]
    return pd.DataFrame(recs, columns=["clip_id", "width", "height",
                                       "feature_md5", "feature_mean"])


def _expected_resample_stats(clips: pd.DataFrame,
                             target_hz: int = 8000) -> pd.DataFrame:
    from .kernels import codec as K_codec
    sub = clips[clips["clip_id"] < CLIP_SUBSET_MAX]
    recs = []
    for cid, raw, sr, codec in zip(sub["clip_id"], sub["bytes"],
                                   sub["sr_hz"], sub["codec"]):
        x = K_codec.decode_float(raw, str(codec))
        n_out, rms6 = K_codec.resample_stats(x, int(sr), target_hz)
        recs.append((cid, int(sr), target_hz, n_out, rms6))
    return pd.DataFrame(recs, columns=["clip_id", "sr_from", "sr_to",
                                       "n_samples_out", "rms_out"])


def _expected_simhash_pairs(docs: pd.DataFrame, cfg: PipelineConfig,
                            max_bits: int = 8) -> pd.DataFrame:
    from .kernels import sketch as K_sketch
    from .kernels import text as K_text
    sh = [K_text.ngram_shingles(str(t), cfg.text_ngram, short_tokens=0)
          for t in docs["text"]]
    offs = np.zeros(len(sh) + 1, dtype=np.int64)
    np.cumsum([a.shape[0] for a in sh], out=offs[1:])
    vals = (np.concatenate(sh) if sh else np.empty(0, np.uint64)
            ).astype(np.uint64, copy=False)
    sim = K_sketch.simhash_batch(vals, offs, cfg)
    ids = docs["doc_id"].to_numpy()

    # INDEPENDENT recompute of the blocking + Hamming filter: a DuckDB
    # popcount-SQL naive self-join over the per-doc sketches (only the
    # sketch definition itself — simhash_batch above — is shared, same as
    # _naive_winnow shares only the hash definition). Semantics mirrored
    # from the operator's documented contract, not its code: 4 x 16-bit
    # block keys, any-block collision, exact bit_count(xor) <= max_bits.
    # BIGINT arithmetic-shift + & 65535 extracts the same 16-bit fields as
    # the engine's unsigned shifts (sign extension only touches bits > 15),
    # and bit_count of a two's-complement xor equals the unsigned popcount.
    import duckdb
    con = duckdb.connect()
    con.register("sims", pd.DataFrame({
        "doc_id": ids.astype(np.int64),
        "sim": sim.view(np.int64)}))
    out = con.execute("""
        WITH blocks AS (
            SELECT doc_id, sim, k, (sim >> (16 * k)) & 65535 AS key
            FROM sims, (SELECT unnest(range(4)) AS k) ks
        ),
        cand AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                   l.sim AS sl, r.sim AS sr
            FROM blocks l JOIN blocks r USING (k, key)
            WHERE l.doc_id < r.doc_id
        )
        SELECT a, b, hamming FROM (
            SELECT a, b, bit_count(xor(sl, sr)) AS hamming FROM cand
        ) WHERE hamming <= ?
        ORDER BY a, b
    """, [int(max_bits)]).df()
    con.close()
    return pd.DataFrame({"a": out["a"].astype(np.int64),
                         "b": out["b"].astype(np.int64),
                         "hamming": out["hamming"].astype(np.int64)})


def _naive_winnow(text: str, window: int = 8, keep: int = 16) -> list[int]:
    """INDEPENDENT reference winnow — plain-Python reimplementation from
    the definition (per-window O(w) polynomial hash recompute, explicit
    window-minima loop), sharing NO code with kernels/text.py's vectorized
    prefix-sum/inverse-power implementation. Only the hash definition
    (sum codes[s+k] * P^k mod 2^64 over char 4-grams of lower()ed text)
    is common, because the golden must equal the operator bit-for-bit."""
    P = (0x9E3779B97F4A7C15 | 1)
    M = 1 << 64
    codes = [ord(c) for c in text.lower()]
    if len(codes) < 4:
        return []
    pw = [pow(P, k, M) for k in range(4)]
    wh = [sum(codes[s + k] * pw[k] for k in range(4)) % M
          for s in range(len(codes) - 3)]
    if len(wh) >= window:
        mins = {min(wh[s: s + window]) for s in range(len(wh) - window + 1)}
    else:
        mins = set(wh)
    out = sorted(mins)[:keep]                      # unsigned order
    return [v - M if v >= (1 << 63) else v for v in out]   # int64 view


def _expected_fingerprints(docs: pd.DataFrame) -> pd.DataFrame:
    """Golden authority = the naive independent winnow; the shared kernel
    is cross-checked against it here (so a bug in the vectorized rolling-
    hash/stride-tricks path cannot silently become 'truth' — the pattern
    the round-2 verdict asked for where a cheap independent recompute
    exists)."""
    from .kernels import text as K_text
    recs = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        naive = _naive_winnow(str(t))
        kern = [int(v) for v in K_text.winnow_fingerprints(str(t))]
        assert kern == naive, (
            f"winnow kernel diverges from independent reference on "
            f"doc_id={did}: {kern[:4]}... vs {naive[:4]}...")
        recs.extend((int(did), fp) for fp in naive)
    return pd.DataFrame(recs, columns=["doc_id", "fp"])


def _indep_ulaw_table() -> list[int]:
    """INDEPENDENT G.711 mu-law decode table, derived from the spec's
    segment form (mag = 4*((2*man + 33) << exp) - 132, the published
    algebraic identity of the chord/step reconstruction) — shares no code
    with kernels/codec.py's vectorized bit-ops implementation."""
    tbl = []
    for b in range(256):
        u = (~b) & 0xFF
        exp = (u >> 4) & 0x07
        man = u & 0x0F
        mag = 4 * ((2 * man + 33) << exp) - 132
        tbl.append(-mag if (u & 0x80) else mag)
    return tbl


def _indep_alaw_table() -> list[int]:
    """INDEPENDENT G.711 A-law decode table from the spec's segment
    midpoint form ((2*man+1 | (2*man+33)<<(seg-1)) 12-bit magnitude,
    rescaled <<4 to 16-bit; sign bit 1 = positive after the 0x55 toggle).
    The mod-2^16 wrap mirrors int16 two's-complement for the
    encoder-unreachable seg-7 codes so the table is total."""
    tbl = []
    for b in range(256):
        u = b ^ 0x55
        seg = (u >> 4) & 0x07
        man = u & 0x0F
        mag12 = (2 * man + 1) if seg == 0 else (2 * man + 33) << (seg - 1)
        v = mag12 << 4
        v = v if (u & 0x80) else -v
        tbl.append(((v + 32768) % 65536) - 32768)
    return tbl


def _expected_stream_features(clips: pd.DataFrame) -> pd.DataFrame:
    """INDEPENDENT golden for the streaming contract row (round-4 verdict
    task #8): per-clip (n_samples, pcm_sha256) recomputed from scratch —
    G.711 decode tables built scalar from the spec (above), float scaling
    as the exact power-of-two division, sha256 over the float32 PCM
    bytes. The shared codec kernel is cross-checked against this
    authority per clip (the _naive_winnow pattern), so a bug in the
    vectorized decode path cannot silently become 'truth'; the contract
    row then proves the STREAM's accumulated state (exactly-once epochs,
    no lost/duplicated clips) equals this from-scratch recompute."""
    import hashlib

    from .kernels import codec as K_codec   # cross-check only
    ulaw = np.asarray(_indep_ulaw_table(), dtype=np.int16)
    alaw = np.asarray(_indep_alaw_table(), dtype=np.int16)
    recs = []
    for cid, raw, codec in zip(clips["clip_id"], clips["bytes"],
                               clips["codec"]):
        raw = bytes(raw)
        codec = str(codec)
        if codec == "pcm_s16le":
            i16 = np.frombuffer(raw, dtype="<i2")
        elif codec == "ulaw":
            i16 = ulaw[np.frombuffer(raw, dtype=np.uint8)]
        elif codec == "alaw":
            i16 = alaw[np.frombuffer(raw, dtype=np.uint8)]
        else:
            raise ValueError(f"unknown codec {codec!r}")
        x = i16.astype(np.float32) / np.float32(32768.0)
        kern = K_codec.decode_float(raw, codec)
        assert np.array_equal(x, kern), (
            f"codec kernel diverges from the independent G.711 decode "
            f"on clip_id={cid} codec={codec}")
        recs.append((cid, int(x.shape[0]),
                     hashlib.sha256(np.ascontiguousarray(x).tobytes())
                     .hexdigest()))
    return pd.DataFrame(recs, columns=["clip_id", "n_samples",
                                       "pcm_sha256"])


def _expected_lang_id(docs: pd.DataFrame) -> pd.DataFrame:
    from .kernels import text as K_text
    # profile build mirror: per-(lang, trigram) document frequency,
    # top-k by (df desc, tri-as-int64 asc) — identical ordering to the
    # Spark window in textops.build_lang_profiles
    df_counts: dict[str, dict[int, int]] = {}
    for lg, t in zip(docs["lang"], docs["text"]):
        u = np.unique(K_text.char_trigram_hashes(str(t)))
        d = df_counts.setdefault(str(lg), {})
        for v in u.view(np.int64):
            d[int(v)] = d.get(int(v), 0) + 1
    from .functions.textops import LANG_PROFILE_TOPK
    profiles = {}
    for lg, d in df_counts.items():
        top = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
        top = top[:LANG_PROFILE_TOPK]
        profiles[lg] = np.sort(np.asarray([k for k, _ in top],
                                          dtype=np.int64).view(np.uint64))
    langs, scores = K_text.lang_scores(docs["text"].astype(str).to_numpy(),
                                       profiles)
    return pd.DataFrame({"doc_id": docs["doc_id"].astype(np.int64),
                         "lang_pred": langs,
                         "lang_score": np.floor(np.asarray(scores) * 1e6
                                                + 0.5) / 1e6})


def _expected_doc_clusters(docs_path: str) -> pd.DataFrame:
    """DuckDB exact-Jaccard >= 0.8 pairs (the same SQL the pair oracle
    uses) + the shared NumPy union-find kernel → canonical doc map."""
    import duckdb

    from .kernels import unionfind as K_uf
    con = duckdb.connect()
    pairs = con.execute(rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
          FROM read_parquet('{docs_path}')
        ), grams AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
          FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
          WHERE len(t) >= 3
        ), sizes AS (
          SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
          FROM grams l JOIN grams r ON l.gram = r.gram
                                   AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b FROM inter
        JOIN sizes sa ON inter.a = sa.doc_id
        JOIN sizes sb ON inter.b = sb.doc_id
        WHERE i / (sa.sz + sb.sz - i) >= 0.8""").df()
    all_ids = con.execute(
        f"SELECT doc_id FROM read_parquet('{docs_path}')").df()["doc_id"]
    comp = K_uf.components(
        list(zip(pairs["a"].astype(int), pairs["b"].astype(int))),
        all_ids.astype(int).to_numpy())
    recs = sorted(comp.items())
    return pd.DataFrame(recs, columns=["doc_id", "canonical_doc_id"]
                        ).astype(np.int64)


def _fold_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Sequential left-fold dot product — bit-identical to Spark's
    F.aggregate(zip_with(...)) double arithmetic."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _expected_ann_lsh(embs: pd.DataFrame, k: int = 10,
                      multiprobe: int = 0) -> pd.DataFrame:
    from itertools import combinations

    from .functions import simops
    n_planes = 8
    mat32 = np.stack(embs["embedding"].to_numpy()).astype(np.float32)
    mat = mat32.astype(np.float64)
    vec_ids = embs["vec_id"].to_numpy().astype(np.int64)
    planes = simops.hyperplanes(n_planes, dim=mat.shape[1])
    bucket = simops.sign_buckets(mat, planes)
    qi = int(np.flatnonzero(vec_ids == 0)[0])
    qv = mat[qi]
    qbucket = int(simops.sign_buckets(qv[None, :], planes)[0])
    # multi-probe: every bucket within Hamming distance <= r of the
    # query's sign pattern (same dial as simops.topk_lsh)
    probe = {qbucket}
    for r in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), r):
            flip = qbucket
            for b in bits:
                flip ^= 1 << b
            probe.add(flip)
    qnorm = np.sqrt(_fold_dot(qv, qv))
    recs = []
    for i in np.flatnonzero(np.isin(bucket, sorted(probe))):
        if vec_ids[i] == 0:
            continue
        e = mat[i]
        sim = _fold_dot(e, qv) / (np.sqrt(_fold_dot(e, e)) * qnorm)
        recs.append((int(vec_ids[i]),
                     float(np.floor(sim * 1e6 + 0.5) / 1e6)))
    recs.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(recs[:k], columns=["vec_id", "cos_sim"])


def _expected_ann_ivf(embs: pd.DataFrame, k_lists: int = 16,
                      nprobe: int = 4, k: int = 10) -> pd.DataFrame:
    from .kernels import ann as K_ann
    pdf = embs.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vec_ids = pdf["vec_id"].to_numpy().astype(np.int64)
    cents = K_ann.kmeans_fit(mat, k_lists)
    assign = K_ann.assign_lists(mat, cents)
    qi = int(np.flatnonzero(vec_ids == 0)[0])
    qv = mat[qi]
    probe = set(int(v) for v in K_ann.rank_lists(qv, cents)[:nprobe])
    qnorm = np.sqrt(_fold_dot(qv, qv))
    recs = []
    for i in range(mat.shape[0]):
        if vec_ids[i] == 0 or int(assign[i]) not in probe:
            continue
        e = mat[i]
        sim = _fold_dot(e, qv) / (np.sqrt(_fold_dot(e, e)) * qnorm)
        recs.append((int(vec_ids[i]),
                     float(np.floor(sim * 1e6 + 0.5) / 1e6)))
    recs.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(recs[:k], columns=["vec_id", "cos_sim"])


def ensure_func_golden(cfg: PipelineConfig = DEFAULT) -> str:
    marker = os.path.join(FUNC_DIR, "_FUNC_GOLDEN_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("version") == VERSION:
                return FUNC_DIR
    os.makedirs(FUNC_DIR, exist_ok=True)
    golden.ensure_clips("correctness")
    clips = pq.read_table(golden.clips_path("correctness")).to_pandas()
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")
                         ).to_pandas()
    embs = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")
                         ).to_pandas()
    _write(_expected_skew_stats(clips, cfg), "expected_skew_stats.parquet")
    _write(_expected_frame_features(clips),
           "expected_frame_features.parquet")
    _write(_expected_image_stub(clips), "expected_image_stub.parquet")
    _write(_expected_resample_stats(clips),
           "expected_resample_stats.parquet")
    _write(_expected_stream_features(clips),
           "expected_stream_features.parquet")
    _write(_expected_simhash_pairs(docs, cfg),
           "expected_simhash_pairs.parquet")
    _write(_expected_fingerprints(docs), "expected_fingerprints.parquet")
    _write(_expected_lang_id(docs), "expected_lang_id.parquet")
    _write(_expected_ann_lsh(embs), "expected_ann_lsh.parquet")
    _write(_expected_ann_lsh(embs, multiprobe=1),
           "expected_ann_lsh_mp1.parquet")
    _write(_expected_ann_ivf(embs), "expected_ann_ivf.parquet")
    _write(_expected_doc_clusters(os.path.join(SF_DIR, "documents.parquet")),
           "expected_doc_clusters.parquet")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": VERSION, "sf_dir": SF_DIR}, f)
    os.replace(tmp, marker)
    return FUNC_DIR


if __name__ == "__main__":
    print(ensure_func_golden())
