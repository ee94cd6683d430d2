"""Face layout + stencil graph conv: parity against the ELLPACK gather path.

The stencil path is the TPU fast path; its ground truth is the gather path,
whose own ground truth is scipy (tests/test_ops.py) — matching the reference
test strategy of layering golden checks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops import spmv
from deepsphere_tpu.ops.stencil import (
    stencil_basis_stack,
    stencil_graph_conv,
    stencil_matvec,
)
from deepsphere_tpu.sphere import faces, healpix as hp


# ---------------------------------------------------------------------------
# face layout
# ---------------------------------------------------------------------------

def test_nest2face_roundtrip(rng):
    nside = 8
    m = rng.rand(3, hp.nside2npix(nside))
    f = faces.nest2face(m, nside, axis=1)
    assert f.shape == (3, 12, nside, nside)
    back = faces.face2nest(f, nside, axis=1)
    assert np.array_equal(back, m)


def test_halo_map_interior_matches_neighbors():
    nside = 8
    h = 2
    hm = faces.halo_map(nside, h)
    assert hm.shape == (12, nside + 2 * h, nside + 2 * h)
    # interior equals the plain face index map
    assert np.array_equal(
        hm[:, h : h + nside, h : h + nside], faces.nest2face_index(nside)
    )
    # direction-exact: map neighbor == neighbors_nest for interior positions
    nb = hp.neighbors_nest(nside, np.arange(hp.nside2npix(nside)))
    n2f = faces.nest2face_index(nside).reshape(-1)
    for d, (dx, dy) in enumerate(zip(hp._NB_XOFFSET, hp._NB_YOFFSET)):
        mapped = hm[:, h + dx : h + dx + nside, h + dy : h + dy + nside].reshape(-1)
        assert np.array_equal(mapped, nb[:, d][n2f])


def test_halo_map_rejects_deep_halo():
    with pytest.raises(ValueError):
        faces.halo_map(4, 4)


# ---------------------------------------------------------------------------
# stencil extraction + matvec
# ---------------------------------------------------------------------------

def test_stencil_matvec_matches_scipy(rng):
    nside = 8
    g = build_sphere_graph(nside, k=8, method="grid")
    st = g.face_stencil(0.75)
    assert st is not None
    L = g.rescaled(0.75)
    x = rng.normal(size=(g.n_pixels, 3)).astype(np.float32)
    y_ref = L @ x

    from deepsphere_tpu.ops.stencil import stencil_tables

    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    xf = jnp.asarray(x)[tables["n2f"]].reshape(12, nside, nside, 3)
    yf = stencil_matvec(st, tables, xf)
    y = np.asarray(yf.reshape(-1, 3))[st.f2n]
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_stencil_rejects_knn_graph():
    g = build_sphere_graph(8, k=8, method="knn")
    assert g.face_stencil(0.75) is None


def test_stencil_rejects_partial_sky():
    g = build_sphere_graph(8, indices=np.arange(200), k=8, method="knn")
    assert g.face_stencil(0.75) is None


@pytest.mark.parametrize(
    "kind,scale,n_terms",
    [("cheby", 0.75, 5), ("mono", 1.0, 4), ("bern", 0.75, 4)],
)
def test_stencil_basis_matches_ellpack(rng, kind, scale, n_terms):
    nside = 8
    g = build_sphere_graph(nside, k=8, method="grid")
    st = g.face_stencil(scale)
    idx, val = g.ellpack(scale)
    x2d = jnp.asarray(rng.normal(size=(g.n_pixels, 6)), jnp.float32)
    basis = {
        "cheby": spmv.chebyshev_basis,
        "mono": spmv.monomial_basis,
        "bern": spmv.bernstein_basis,
    }[kind]
    ref = basis(jnp.asarray(idx), jnp.asarray(val), x2d, n_terms)
    got = stencil_basis_stack(st, kind, x2d, n_terms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize(
    "kind,scale,n_terms",
    [("cheby", 0.75, 5), ("mono", 1.0, 3), ("bern", 0.75, 4)],
)
def test_stencil_conv_matches_ellpack_conv(rng, kind, scale, n_terms):
    nside = 4
    g = build_sphere_graph(nside, k=8, method="grid")
    st = g.face_stencil(scale)
    B, Fin, Fout = 3, 2, 5
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * n_terms, Fout)), jnp.float32)
    idx, val = jnp.asarray(g.ellpack(scale)[0]), jnp.asarray(g.ellpack(scale)[1])
    basis = {
        "cheby": spmv.chebyshev_basis,
        "mono": spmv.monomial_basis,
        "bern": spmv.bernstein_basis,
    }[kind]
    y_ref = spmv.graph_conv(lambda x2d, nt: basis(idx, val, x2d, nt), x, kern, n_terms)
    y = stencil_graph_conv(st, x, kern, n_terms, kind)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_stencil_conv_gradients_match(rng):
    """Autodiff through the stencil path agrees with the gather path."""
    nside = 4
    g = build_sphere_graph(nside, k=8, method="grid")
    st = g.face_stencil(0.75)
    idx, val = g.ellpack(0.75)
    idx, val = jnp.asarray(idx), jnp.asarray(val)
    B, Fin, Fout, K = 2, 2, 3, 4
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss_st(x, kern):
        return jnp.sum(stencil_graph_conv(st, x, kern, K, "cheby") ** 2)

    def loss_el(x, kern):
        return jnp.sum(
            spmv.graph_conv(
                lambda x2d, nt: spmv.chebyshev_basis(idx, val, x2d, nt), x, kern, K
            )
            ** 2
        )

    gx_st, gk_st = jax.grad(loss_st, argnums=(0, 1))(x, kern)
    gx_el, gk_el = jax.grad(loss_el, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_st), np.asarray(gx_el), rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_st), np.asarray(gk_el), rtol=2e-3, atol=1e-3)


def test_conv_layer_uses_stencil_path(rng):
    """ChebyshevConv auto-selects the stencil path on grid graphs and the
    result matches conv_method='ellpack'."""
    from deepsphere_tpu.nn.layers import ChebyshevConv

    nside = 4
    g = build_sphere_graph(nside, k=8, method="grid")
    x = jnp.asarray(rng.normal(size=(2, g.n_pixels, 3)), jnp.float32)
    layer_a = ChebyshevConv(graph=g, K=4, Fout=5, conv_method="auto")
    layer_e = ChebyshevConv(graph=g, K=4, Fout=5, conv_method="ellpack")
    va = layer_a.init(jax.random.key(0), x)
    ve = layer_e.init(jax.random.key(0), x)
    assert "stencil" in va["graph_tables"]  # auto picked the stencil path
    assert "ellpack" in ve["graph_tables"]
    ve = {**ve, "params": va["params"]}  # same weights through both paths
    ya = layer_a.apply(va, x)
    ye = layer_e.apply(ve, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(ye), atol=1e-4)
    assert g.face_stencil(0.75) is not None


def test_conv_layer_stencil_method_raises_on_knn():
    from deepsphere_tpu.nn.layers import ChebyshevConv

    g = build_sphere_graph(4, k=8, method="knn")
    x = jnp.zeros((1, g.n_pixels, 2), jnp.float32)
    layer = ChebyshevConv(graph=g, K=3, Fout=2, conv_method="stencil")
    with pytest.raises(ValueError):
        layer.init(jax.random.key(0), x)
