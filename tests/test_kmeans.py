"""Numpy-replica oracle for the iterative Lloyd k-means operator.

kmeans_lloyd is deterministic by construction (argmin with id
tie-break, order-independent fixed-point centroid sums), so the oracle
replays the IDENTICAL arithmetic in numpy — same per-dimension fold
order, same floor/scale quantization — and the assignments must match
exactly, not approximately. A second test checks the Lloyd invariant
(SSE non-increasing across iterations) on the replica path.
"""

import numpy as np
import pandas as pd

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.plans.training import (
    KMEANS_ITERS,
    KMEANS_K,
    _KM_SCALE,
    kmeans_lloyd,
)


def _load(spark, sf_dir):
    pdf = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_list()).astype(np.float64)
    return ids, mat


def _d2(mat, centroids):
    """Sequential per-dimension fold, mirroring the Spark aggregate."""
    n, d = mat.shape
    out = np.zeros((n, len(centroids)), dtype=np.float64)
    for c_idx, c in enumerate(centroids):
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):
            diff = mat[:, j] - c[j]
            acc += diff * diff
        out[:, c_idx] = acc
    return out


def _replica(ids, mat, k, iters):
    centroids = [mat[np.where(ids == i)[0][0]].copy() for i in range(k)]
    sses = []
    for _ in range(iters):
        d2 = _d2(mat, centroids)
        assign = d2.argmin(axis=1)  # first occurrence == lowest id tiebreak
        sses.append(d2[np.arange(len(ids)), assign].sum())
        for c_idx in range(k):
            members = mat[assign == c_idx]
            if len(members):
                s = np.floor(members * _KM_SCALE).astype(np.int64).sum(axis=0)
                centroids[c_idx] = s / _KM_SCALE / len(members)
    final = _d2(mat, centroids).argmin(axis=1)
    sses.append(_d2(mat, centroids)[np.arange(len(ids)), final].sum())
    return final, sses


def test_kmeans_matches_numpy_replica(spark, sf_dir):
    ids, mat = _load(spark, sf_dir)
    expected, _ = _replica(ids, mat, KMEANS_K, KMEANS_ITERS)
    got = kmeans_lloyd(spark, sf_dir).toPandas().sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster"].to_numpy() == expected).all()
    # non-degenerate clustering: more than one cluster in use
    assert got["cluster"].nunique() > 1


def test_kmeans_sse_descends(spark, sf_dir):
    ids, mat = _load(spark, sf_dir)
    _, sses = _replica(ids, mat, KMEANS_K, KMEANS_ITERS)
    # Lloyd descent; the 1e-10 fixed-point quantization of means can
    # perturb SSE by orders of magnitude less than any real step
    for a, b in zip(sses, sses[1:]):
        assert b <= a * (1 + 1e-9), sses
