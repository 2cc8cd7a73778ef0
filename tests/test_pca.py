"""Numpy cross-check for the distributed PCA (fit via moment partials,
project via JVM HOF folds) — the rows-only stand-in for a DuckDB oracle,
since eigendecomposition is not SQL-expressible.
"""

import numpy as np
import pandas as pd

from gravity_spark.functions import similarity as sim
from gravity_spark.queries import REGISTRY


def _numpy_reference(sf_dir, k=8):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    mu = M.mean(axis=0)
    cov = (M.T @ M) / len(M) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    W = []
    for i in order:
        w = evecs[:, i].copy()
        j = int(np.argmax(np.abs(w)))
        if w[j] < 0:
            w = -w
        W.append(w)
    W = np.vstack(W)
    ids = pdf["vec_id"].to_numpy()
    proj = (M - mu) @ W.T
    err = ((M - mu) ** 2).sum(axis=1) - (proj**2).sum(axis=1)
    return ids, proj, err


def test_pca_matches_numpy(spark, sf_dir):
    df = REGISTRY["embedding_pca_project"].spark(spark, sf_dir)
    # graded surface is scalar p1..p8 (driver canonicalizer can't sort
    # array columns) — also assert no array/map/struct column leaks back
    for f in df.schema.fields:
        assert f.dataType.simpleString() in ("int", "bigint", "string", "double"), f
    rows = {r.vec_id: r for r in df.collect()}
    ids, proj, err = _numpy_reference(sf_dir)
    assert len(rows) == len(ids)
    for i, vid in enumerate(ids):
        r = rows[int(vid)]
        got = [getattr(r, f"p{j + 1}") for j in range(8)]
        assert np.allclose(got, proj[i], atol=1e-5)
        assert abs(r.recon_err - err[i]) < 1e-4
        assert r.recon_err >= -1e-9  # orthonormal W => non-negative


def test_pca_fit_components_orthonormal(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mean, comps, expl = sim.pca_fit(emb, k=8, dim=64)
    W = np.vstack(comps)
    assert np.allclose(W @ W.T, np.eye(8), atol=1e-8)
    # explained variance sorted descending, sign canon: max-|w| entry > 0
    assert all(a >= b for a, b in zip(expl, expl[1:]))
    for w in W:
        assert w[int(np.argmax(np.abs(w)))] > 0


def test_pca_deterministic_across_runs(spark, sf_dir):
    q = REGISTRY["embedding_pca_project"].spark
    a = sorted(map(tuple, (tuple(r) for r in q(spark, sf_dir).collect())))
    b = sorted(map(tuple, (tuple(r) for r in q(spark, sf_dir).collect())))
    assert a == b
