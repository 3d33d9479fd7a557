"""Distributed two-pass PCA vs single-process numpy PCA (same sign
convention); partition invariance of the moment accumulation."""

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.similarity import pca_project


def _data(seed=0, n=400, d=16):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so the top components are well separated
    basis = rng.standard_normal((d, d))
    scales = np.linspace(5, 0.1, d)
    x = rng.standard_normal((n, d)) * scales @ basis
    return pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x)})


def _numpy_pca(x, k):
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return (x - mu) @ comps.T, comps, evals[order]


def test_pca_matches_numpy(ray_session):
    df = _data()
    x = np.stack(df["embedding"].to_numpy())
    k = 5
    proj_ds, comps, ev = pca_project(
        rd.from_pandas(df), n_components=k, id_col="vec_id"
    )
    got = proj_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    want_proj, want_comps, want_ev = _numpy_pca(x, k)
    assert np.allclose(comps, want_comps, atol=1e-9)
    assert np.allclose(ev, want_ev, atol=1e-9)
    got_m = got[[f"pc{i}" for i in range(k)]].to_numpy()
    assert np.allclose(got_m, want_proj, atol=1e-8)
    # orthonormal basis
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-10)


def test_pca_partition_invariance(ray_session):
    df = _data(seed=3)
    a, ca, _ = pca_project(rd.from_pandas(df), n_components=3)
    b, cb, _ = pca_project(rd.from_pandas(df).repartition(13), n_components=3)
    assert np.allclose(ca, cb, atol=1e-9)
    ap = a.to_pandas().sort_values("vec_id").reset_index(drop=True)
    bp = b.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert np.allclose(
        ap[["pc0", "pc1", "pc2"]].to_numpy(),
        bp[["pc0", "pc1", "pc2"]].to_numpy(),
        atol=1e-9,
    )
