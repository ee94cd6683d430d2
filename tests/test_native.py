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


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("nside,r,sig", [(8, 2, 0.05), (16, 4, 0.02)])
def test_gauss_template_matches_numpy(nside, r, sig, masked):
    """ds_gauss_template (Morton-quad C++ pass) vs the numpy oracle
    nn.smoothing._template_ellpack_numpy: identical columns, values to
    f64 round-off.  Covers the reference's BallTree smoothing-kernel
    build (healpy_layers.py:766-799 analog)."""
    from deepsphere_tpu.nn.smoothing import _template_ellpack_numpy

    idx = None
    if masked:
        rng = np.random.default_rng(0)
        idx = np.sort(
            rng.choice(12 * nside * nside, size=9 * nside * nside,
                       replace=False)
        )
    ei, ev = native.gauss_template(nside, r, sig, 3.0, idx)
    ei0, ev0 = _template_ellpack_numpy(nside, sig, r, 3.0, idx)
    np.testing.assert_array_equal(ei, ei0)
    np.testing.assert_allclose(ev, ev0, atol=1e-13)


@pytest.mark.parametrize("nside,r,n_extra", [(16, 4, 0), (16, 4, 3), (8, 2, 3)])
def test_ellpack_stencil_planes_matches_numpy(nside, r, n_extra):
    """face_stencil's generic native extraction (ds_ellpack_stencil_planes,
    raster fast path + boundary search) against the pure-numpy
    _lookup_entries loop — every FaceStencil field must agree."""
    from deepsphere_tpu.graph import stencil as st
    from deepsphere_tpu.nn.smoothing import _template_ellpack_numpy

    class G:
        method = "grid"

        def __init__(self, raster):
            self.nside = nside
            self.stencil_radius = r
            self.k = 8
            self.n_pixels = 12 * nside * nside
            self.indices = np.arange(self.n_pixels)
            if raster:
                self._ell_raster_ordered = True

        def ellpack(self, scale):
            return ei, ev

    ei, ev = _template_ellpack_numpy(nside, 0.02 if nside == 16 else 0.05,
                                     r, 3.0)
    out_nat = st.face_stencil(G(True), 1.0, n_steps=r + n_extra)
    orig = native.available
    native.available = lambda: False
    try:
        out_np = st.face_stencil(G(False), 1.0, n_steps=r + n_extra)
    finally:
        native.available = orig

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            assert set(a) == set(b), path
            for k in a:
                cmp(a[k], b[k], path + "." + str(k))
        elif isinstance(a, np.ndarray):
            if a.dtype.kind in "fc":
                np.testing.assert_allclose(a, b, atol=1e-6, err_msg=path)
            else:
                np.testing.assert_array_equal(a, b, err_msg=path)
        elif isinstance(a, (tuple, list)):
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                cmp(x, y, path + f"[{i}]")
        elif hasattr(a, "__dict__") and not isinstance(
            a, (int, float, str, bool, type(None))
        ):
            cmp(vars(a), vars(b), path + ":obj")
        else:
            assert a == b, (path, a, b)

    cmp(out_nat, out_np)
