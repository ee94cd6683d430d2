"""Native C++ core vs the numpy oracle.

The C++ library replaces the reference's delegated native geometry (healpy's
C++ HEALPix core, ARPACK) for host precompute; these tests pin it against
the pure-numpy implementations bit-for-bit (geometry) / to float tolerance
(graph values, lmax)."""

import numpy as np
import pytest

from deepsphere_tpu import native
from deepsphere_tpu.graph import laplacian as gl
from deepsphere_tpu.graph.stencil import face_stencil
from deepsphere_tpu.sphere import healpix as hp

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("nside", [1, 4, 16])
def test_neighbors_match(nside):
    got = native.neighbors_nest(nside)
    want = hp.neighbors_nest(nside, np.arange(hp.nside2npix(nside)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nside", [1, 4, 16])
def test_pix2vec_match(nside):
    got = native.pix2vec_nest(nside)
    want = hp.pix2vec(nside, np.arange(hp.nside2npix(nside)), nest=True)
    np.testing.assert_allclose(got, want, atol=1e-14)


@pytest.mark.parametrize("nside", [8, 32])
def test_grid_laplacian_matches_numpy(nside):
    import scipy.sparse as sp

    res = native.grid_laplacian(nside)
    W_py, kw_py = gl._grid_adjacency(nside, np.arange(hp.nside2npix(nside)))
    assert abs(res["kernel_width"] - kw_py) < 1e-12
    L_py = gl._normalized_laplacian(W_py)
    M = hp.nside2npix(nside)
    rows = np.repeat(np.arange(M), 9)
    L_c = sp.csr_matrix(
        (res["ell_val"].ravel(), (rows, res["ell_idx"].ravel())), shape=(M, M)
    )
    assert abs(L_c - L_py).max() < 1e-12
    # Lanczos lmax is tighter than loose-tol ARPACK; compare to exact at
    # small scale
    if nside == 8:
        exact = np.linalg.eigvalsh(L_py.toarray())[-1] * 1.02
        # Lanczos with the default iteration budget sits well inside the
        # 2% safety margin
        assert abs(res["lmax"] - exact) < 1e-3 * exact


def test_native_graph_end_to_end(rng):
    """build_sphere_graph uses the native path; results match a forced
    numpy build to float tolerance through the conv."""
    import os

    import jax.numpy as jnp

    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables

    nside, K = 8, 4
    g_nat = build_sphere_graph(nside, k=8, method="grid")
    assert g_nat._ell_L is not None  # native path engaged

    # numpy-built twin
    W, kw = gl._grid_adjacency(nside, np.arange(hp.nside2npix(nside)),
                               width_ratio=gl.harmonic_width_ratio(8, nside))
    L = gl._normalized_laplacian(W)
    g_py = gl.graph_from_laplacian(L, A=W, lmax=g_nat.lmax, nside=nside, k=8)

    st_n = face_stencil(g_nat, 0.75, n_steps=1)
    st_p = face_stencil(g_py, 0.75, n_steps=1)
    np.testing.assert_allclose(st_n.weights, st_p.weights, atol=1e-6)

    x = jnp.asarray(rng.normal(size=(2, g_nat.n_pixels, 3)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3 * K, 5)), jnp.float32)
    y_n = stencil_graph_conv(st_n, x, kern, K, "cheby",
                             tables=stencil_tables(st_n))
    y_p = stencil_graph_conv(st_p, x, kern, K, "cheby",
                             tables=stencil_tables(st_p))
    np.testing.assert_allclose(np.asarray(y_n), np.asarray(y_p), atol=1e-4)


def test_lazy_csr_materialization():
    g = build = None
    from deepsphere_tpu.graph import build_sphere_graph

    g = build_sphere_graph(8, k=8, method="grid")
    if g._ell_L is None:
        pytest.skip("native path not engaged")
    assert g.L is None and g.A is None  # lazy until needed
    edges = g.edge_idx  # forces A
    assert g.A is not None and edges.shape[1] == 2
    Lr = g.rescaled(0.75)  # forces L
    assert g.L is not None
    idx, val = g.ellpack(0.75)
    # ELLPACK fast path equals the csr route
    import scipy.sparse as sp

    M = g.n_pixels
    rows = np.repeat(np.arange(M), idx.shape[1])
    L2 = sp.csr_matrix((val.ravel(), (rows, idx.ravel())), shape=(M, M))
    assert abs(L2 - Lr).max() < 1e-6
