"""Sphere-graph construction tests: kNN adjacency, normalized Laplacian
spectrum, ELLPACK round-trip, caching."""

import numpy as np
import pytest
from scipy import sparse

from deepsphere_tpu.graph import (
    build_sphere_graph,
    graph_from_laplacian,
    lmax_bound,
    rescale_laplacian,
)
from deepsphere_tpu.sphere import healpix as hp


def test_full_sphere_graph_structure():
    g = build_sphere_graph(4, k=8)
    n = hp.nside2npix(4)
    assert g.n_pixels == n
    A = g.A
    # symmetric, zero diagonal, positive weights
    assert (A != A.T).nnz == 0
    assert np.allclose(A.diagonal(), 0.0)
    assert A.data.min() > 0
    # each node has >= 8 neighbors after symmetrization
    deg = np.diff(A.indptr)
    assert deg.min() >= 8
    # normalized Laplacian: symmetric PSD with spectrum <= 2
    L = g.L
    assert (abs(L - L.T) > 1e-10).nnz == 0
    evals = np.linalg.eigvalsh(L.toarray())
    assert evals.min() > -1e-8
    assert evals.max() <= 2.0 + 1e-8
    assert g.lmax >= evals.max()


def test_rescale_laplacian_spectrum():
    g = build_sphere_graph(2, k=8)
    # L <- (2 scale / lmax) L - I maps [0, lmax] to [-1, 2 scale - 1]
    Lr = g.rescaled(scale=0.75)
    evals = np.linalg.eigvalsh(Lr.toarray())
    assert evals.min() >= -1 - 1e-9
    assert evals.max() <= 2 * 0.75 - 1 + 1e-9


def test_ellpack_roundtrip():
    g = build_sphere_graph(2, k=8)
    idx, val = g.ellpack(scale=0.75)
    M = g.n_pixels
    dense = np.zeros((M, M))
    for i in range(M):
        for j, v in zip(idx[i], val[i]):
            dense[i, j] += v
    assert np.allclose(dense, g.rescaled(0.75).toarray(), atol=1e-6)


def test_partial_sky_graph():
    indices = np.arange(48)  # one quarter of nside=4... first 48 NEST pixels
    g = build_sphere_graph(4, indices=indices, k=8)
    assert g.n_pixels == 48
    assert g.L.shape == (48, 48)


def test_graph_cache(tmp_path):
    g1 = build_sphere_graph(2, k=8, cache_dir=str(tmp_path))
    g2 = build_sphere_graph(2, k=8, cache_dir=str(tmp_path))
    assert np.allclose(g1.L.toarray(), g2.L.toarray())
    assert g1.lmax == g2.lmax
    assert g1 == g2  # content-key equality


def test_edge_idx_sorted_row_major():
    g = build_sphere_graph(2, k=8)
    e = g.edge_idx
    order = np.lexsort((e[:, 1], e[:, 0]))
    assert np.all(order == np.arange(len(e)))
    assert e.shape[1] == 2


def test_graph_from_laplacian(rng):
    R = rng.normal(size=(5, 5))
    L = R @ R.T
    g = graph_from_laplacian(L)
    assert np.allclose(g.L.toarray(), L)
    assert g.lmax == pytest.approx(1.02 * np.abs(np.linalg.eigvalsh(L)).max(), rel=1e-4)


def test_lmax_bound_matches_dense(rng):
    R = rng.normal(size=(20, 20))
    L = sparse.csr_matrix(R @ R.T)
    lm = lmax_bound(L)
    assert lm == pytest.approx(1.02 * np.abs(np.linalg.eigvalsh(L.toarray())).max(), rel=1e-5)


def test_rescale_matches_reference_formula(rng):
    R = rng.normal(size=(6, 6))
    L = sparse.csr_matrix(R @ R.T)
    lmax, scale = 3.0, 0.75
    got = rescale_laplacian(L, lmax, scale).toarray()
    want = L.toarray() * (2 * scale / lmax) - np.eye(6)
    assert np.allclose(got, want)


def test_harmonic_width_default():
    """Default kernel_width follows the harmonic width table (re-derivation
    of the pygsp fork's tuned per-(nside, k) widths, setup.cfg:20 /
    arXiv:2012.15000 §3): width = ratio * mean neighbor distance, and the
    Laplacian spectrum aligns with the spherical-harmonic multiplets
    strictly better than with the legacy mean-distance width."""
    from deepsphere_tpu.graph.laplacian import harmonic_width_ratio

    nside = 8
    g_harm = build_sphere_graph(nside, k=8, method="grid")
    g_mean = build_sphere_graph(nside, k=8, method="grid",
                                kernel_width="mean")
    ratio = harmonic_width_ratio(8, nside)
    assert ratio == pytest.approx(0.5166)
    assert g_harm.kernel_width == pytest.approx(ratio * g_mean.kernel_width,
                                                rel=1e-12)
    # table lookup: above-table nsides reuse the largest tabulated ratio
    assert harmonic_width_ratio(8, 1024) == pytest.approx(0.5029)
    assert harmonic_width_ratio(7, 64) is None

    def multiplet_dispersion(L, lmax_fit=10):
        lam = np.linalg.eigvalsh(L.toarray())
        err, pos = 0.0, 1
        for l in range(1, lmax_fit + 1):
            grp = lam[pos : pos + 2 * l + 1]
            pos += 2 * l + 1
            err += grp.std() / grp.mean()
        return err / lmax_fit

    g_harm._materialize()
    g_mean._materialize()
    assert multiplet_dispersion(g_harm.L) < 0.6 * multiplet_dispersion(g_mean.L)


def test_harmonic_width_native_and_numpy_agree():
    """The native (C++) ratio-mode build must produce the same width as the
    numpy path (negative-kernel_width ABI convention)."""
    from deepsphere_tpu import native

    if not native.available():
        pytest.skip("native core unavailable")
    res = native.grid_laplacian(8, -0.5166)
    g = build_sphere_graph(8, k=8, method="grid")
    assert res["kernel_width"] == pytest.approx(g.kernel_width, rel=1e-12)
