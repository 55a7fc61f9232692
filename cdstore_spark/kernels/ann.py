"""IVF (inverted-file) ANN kernels: deterministic spherical k-means and
list assignment/ranking — shared by the Spark index operators
(functions/simops.py) and the single-node golden mirror (golden_funcs.py),
so distributed probe results can be held to exact equality.

All randomness derives from an explicit seed tuple; ties break on the
lowest index, so fit/assign/rank are pure functions of their inputs.
"""

from __future__ import annotations

import numpy as np


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.where(norms > 0, mat / np.maximum(norms, 1e-300), 0.0)


def kmeans_fit(mat: np.ndarray, k: int, iters: int = 10,
               seed: tuple[int, int] = (42, 7001)) -> np.ndarray:
    """Spherical k-means (cosine metric): returns (k, d) unit centroids.

    Deterministic: seeded init (k distinct rows), argmax assignment with
    first-index tie-break, empty clusters keep their previous centroid.
    """
    mat = _normalize(np.asarray(mat, dtype=np.float64))
    n = mat.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    cents = mat[np.sort(rng.choice(n, size=k, replace=False))].copy()
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        new = cents.copy()
        for j in range(k):
            members = mat[assign == j]
            if members.shape[0]:
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    new[j] = m / nm
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def assign_lists(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid (max cosine) list id per row, int32."""
    return (_normalize(np.asarray(mat, dtype=np.float64))
            @ cents.T).argmax(axis=1).astype(np.int32)


def rank_lists(qv: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """List ids ordered by decreasing centroid similarity to the query
    (stable: ties keep ascending list id)."""
    q = np.asarray(qv, dtype=np.float64)
    nq = np.linalg.norm(q)
    if nq > 0:
        q = q / nq
    scores = cents @ q
    return np.argsort(-scores, kind="stable").astype(np.int32)
