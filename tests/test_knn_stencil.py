"""Exact-kNN graphs on the stencil conv path.

The reference's graphs are kNN graphs (pygsp ``SphereHealpix``,
``healpy_networks.py:110-118``).  Round 1 ran them on the serialized-gather
ELLPACK path; the capture-window extraction (``KNN_CAPTURE_RADIUS`` +
corrupt-row exact recompute, ``graph/stencil.py``) now runs them on the
stencil path with EXACT numerics.  These tests pin stencil-vs-gather
agreement for forward and gradients, fused deep stencils and per-step
single-application stencils, full and partial skies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops.spmv import chebyshev_basis, graph_conv
from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _gather_conv(g, x, kern, n_terms):
    idx, val = g.ellpack(0.75)
    idx = jnp.asarray(idx)
    val = jnp.asarray(val)
    return graph_conv(
        lambda x2d, nt: chebyshev_basis(idx, val, x2d, nt), x, kern, n_terms
    )


def _stencil_conv(st, x, kern, n_terms):
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    return stencil_graph_conv(
        st, x, kern, n_terms, "cheby", tables=tables, layout="nest"
    )


def test_knn_deep_stencil_matches_gather(rng):
    """nside=32 k=8 kNN, K=5 deep stencil (radius-2 capture, ~23% corrupt
    corner rows recomputed from the ball) vs the ELLPACK gather path."""
    K, B, Fin, Fout = 5, 2, 2, 3
    g = build_sphere_graph(32, k=8, method="knn")
    st = g.deep_stencil(0.75, K)
    assert st is not None and st.radius == 2
    assert st.corrupt_rows.shape[0] > 0  # corner wedges are real

    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    y_st = _stencil_conv(st, x, kern, K)
    y_ref = _gather_conv(g, x, kern, K)
    np.testing.assert_allclose(
        np.asarray(y_st), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow  # forward equivalence (above) stays in the default set
def test_knn_deep_stencil_grads_match(rng):
    K, B, Fin, Fout = 5, 1, 2, 2
    g = build_sphere_graph(32, k=8, method="knn")
    st = g.deep_stencil(0.75, K)
    assert st is not None
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss_st(x, k):
        return jnp.sum(_stencil_conv(st, x, k, K) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_gather_conv(g, x, k, K) ** 2)

    gx1, gk1 = jax.grad(loss_st, argnums=(0, 1))(x, kern)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    scale = np.abs(np.asarray(gx2)).max()
    np.testing.assert_allclose(
        np.asarray(gx1) / scale, np.asarray(gx2) / scale, atol=2e-6
    )
    scale = np.abs(np.asarray(gk2)).max()
    np.testing.assert_allclose(
        np.asarray(gk1) / scale, np.asarray(gk2) / scale, atol=2e-6
    )


def test_knn_single_step_stencil_exact(rng):
    """k=20 kNN at nside=16: the radius-3 capture window holds every row
    (no corrupt rows needed for a single application)."""
    K, B, Fin, Fout = 2, 2, 1, 2
    g = build_sphere_graph(16, k=20, method="knn")
    st = g.deep_stencil(0.75, K)
    assert st is not None and st.radius == 3
    assert st.corrupt_rows.shape[0] == 0
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    y_st = _stencil_conv(st, x, kern, K)
    y_ref = _gather_conv(g, x, kern, K)
    np.testing.assert_allclose(
        np.asarray(y_st), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )


def test_knn_deep_fusion_falls_back_at_tiny_nside():
    """At nside=16, K=5 the corner-wedge corrupt set would swallow the map:
    deep_stencil declines and the single-application stencil still works."""
    g = build_sphere_graph(16, k=8, method="knn")
    assert g.deep_stencil(0.75, 5) is None
    st = g.face_stencil(0.75)
    assert st is not None and st.corrupt_rows.shape[0] == 0


def test_knn_layer_runs_stencil_path(rng):
    """A ChebConv over a kNN graph must route through the stencil path
    (conv_method='stencil' no longer raises) and agree with ellpack."""
    from deepsphere_tpu.nn.layers import ChebyshevConv

    K, B, Fin, Fout = 5, 2, 2, 3
    g = build_sphere_graph(32, k=8, method="knn")
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)

    outs = {}
    for method in ("stencil", "ellpack"):
        lay = ChebyshevConv(graph=g, K=K, Fout=Fout, conv_method=method,
                            use_bias=False, use_bn=False)
        vs = lay.init(jax.random.PRNGKey(0), x)
        outs[method] = np.asarray(lay.apply(vs, x))
    np.testing.assert_allclose(
        outs["stencil"], outs["ellpack"], rtol=2e-5, atol=2e-5
    )
