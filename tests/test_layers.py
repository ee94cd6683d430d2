"""Layer zoo vs the reference test strategy (tests/test_gnn_layers.py and
tests/test_healpy_layers.py): construction + activation/bias/BN variants on
a tiny custom Laplacian, pooling goldens vs the analytic NEST reduction,
pseudo-conv shape contracts, and the exception paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_tpu.graph import graph_from_laplacian
from deepsphere_tpu.nn.layers import (
    BernsteinConv,
    ChebyshevConv,
    HealpyPool,
    HealpyPseudoConv,
    HealpyPseudoConv_Transpose,
    MonomialConv,
    ResidualLayer,
)
from deepsphere_tpu.sphere import healpix as hp


@pytest.fixture()
def tiny_graph(rng):
    """Random symmetric 3x3 'Laplacian' — the reference's layer test graph
    (test_gnn_layers.py:12-15)."""
    R = rng.normal(size=(3, 3))
    return graph_from_laplacian(R @ R.T)


@pytest.mark.parametrize("cls,K", [(ChebyshevConv, 4), (MonomialConv, 4), (BernsteinConv, 4)])
def test_conv_variants(rng, tiny_graph, cls, K):
    x = jnp.asarray(rng.normal(size=(5, 3, 7)), jnp.float32)
    for kwargs in (
        {},
        {"activation": "linear"},
        {"activation": "elu"},
        {"activation": "relu", "use_bias": True, "use_bn": True},
    ):
        layer = cls(graph=tiny_graph, K=K, Fout=3, **kwargs)
        v = layer.init(jax.random.key(13), x)
        y = layer.apply(v, x, training=False)
        assert y.shape == (5, 3, 3)
        assert np.isfinite(np.asarray(y)).all()
        # kernel layout parity: [K_terms * Fin, Fout]
        n_terms = K + (1 if cls is BernsteinConv else 0)
        assert v["params"]["kernel"].shape == (7 * n_terms, 3)


def test_conv_fout_none_keeps_channels(rng, tiny_graph):
    x = jnp.asarray(rng.normal(size=(2, 3, 5)), jnp.float32)
    layer = ChebyshevConv(graph=tiny_graph, K=3)
    v = layer.init(jax.random.key(0), x)
    assert layer.apply(v, x).shape == (2, 3, 5)


def test_residual_layer(rng):
    n_pix = hp.nside2npix(4)
    m_in = jnp.asarray(rng.normal(size=(3, n_pix, 7)), jnp.float32)
    graph = graph_from_laplacian(np.eye(n_pix))

    with pytest.raises(IOError):
        ResidualLayer(graph=graph, layer_type="juhu", layer_kwargs={}).init(
            jax.random.key(0), m_in
        )

    for extra in (
        {},
        {"use_bn": True},
        {"use_bn": True, "norm_type": "layer_norm", "bn_kwargs": {"axis": (1, 2)}},
        {"act_before": True, "alpha": 0.5},
    ):
        layer = ResidualLayer(
            graph=graph, layer_type="CHEBY",
            layer_kwargs={"K": 5, "activation": "relu"},
            activation="relu", **extra,
        )
        v = layer.init(jax.random.key(0), m_in)
        out = layer.apply(v, m_in, training=True, mutable=["batch_stats"])[0]
        assert out.shape == (3, n_pix, 7)

    with pytest.raises(ValueError):
        ResidualLayer(
            graph=graph, layer_type="CHEBY", layer_kwargs={"K": 5},
            activation="relu", use_bn=True, norm_type="moving_norm",
        ).init(jax.random.key(0), m_in)


def test_residual_identity_laplacian_semantics(rng):
    """With L = I and zero kernels, out = act(alpha * x) + ... reduces to the
    pure skip path — checks the ``act(y + alpha x)`` coupling."""
    n_pix = 48
    graph = graph_from_laplacian(np.eye(n_pix))
    x = jnp.asarray(np.abs(rng.normal(size=(2, n_pix, 3))), jnp.float32)
    layer = ResidualLayer(
        graph=graph, layer_type="CHEBY", layer_kwargs={"K": 2},
        activation="relu", alpha=2.0,
    )
    v = layer.init(jax.random.key(0), x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, v["params"])
    y = layer.apply({**v, "params": zeroed}, x)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.asarray(x), atol=1e-6)


# ---------------------------------------------------------------------------
# pooling goldens (reference: HealpyPool AVG == hp.ud_grade, MAX == reshape
# max; tests/test_healpy_layers.py:21-37)
# ---------------------------------------------------------------------------

def test_pool_avg_matches_ud_grade(rng):
    nside = 8
    n_pix = hp.nside2npix(nside)
    m = rng.normal(size=(1, n_pix, 1)).astype(np.float32)
    layer = HealpyPool(p=1, pool_type="AVG")
    out = layer.apply({}, jnp.asarray(m))
    expect = hp.ud_grade(m[0, :, 0], nside_out=nside // 2, order_in="NESTED")
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], expect, atol=1e-5)


def test_pool_max_matches_reshape(rng):
    nside = 8
    n_pix = hp.nside2npix(nside)
    m = rng.normal(size=(1, n_pix, 1)).astype(np.float32)
    out = HealpyPool(p=1, pool_type="MAX").apply({}, jnp.asarray(m))
    expect = m[0, :, 0].reshape(-1, 4).max(axis=1)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], expect, atol=1e-5)


def test_pool_exceptions():
    with pytest.raises(IOError):
        HealpyPool(p=0)
    with pytest.raises(IOError):
        HealpyPool(p=1, pool_type="HUHU")


# ---------------------------------------------------------------------------
# pseudo convs (reference tests/test_healpy_layers.py:40-76)
# ---------------------------------------------------------------------------

def test_pseudo_conv_shapes(rng):
    nside = 8
    n_pix = hp.nside2npix(nside)
    m = jnp.asarray(rng.normal(size=(3, n_pix, 2)), jnp.float32)
    layer = HealpyPseudoConv(p=2, Fout=5)
    v = layer.init(jax.random.key(0), m)
    assert layer.apply(v, m).shape == (3, n_pix // 16, 5)
    with pytest.raises(IOError):
        HealpyPseudoConv(p=0, Fout=5)


def test_pseudo_conv_transpose_shapes(rng):
    nside = 4
    n_pix = hp.nside2npix(nside)
    m = jnp.asarray(rng.normal(size=(3, n_pix, 2)), jnp.float32)
    layer = HealpyPseudoConv_Transpose(p=2, Fout=5)
    v = layer.init(jax.random.key(0), m)
    assert layer.apply(v, m).shape == (3, n_pix * 16, 5)
    with pytest.raises(IOError):
        HealpyPseudoConv_Transpose(p=0, Fout=5)


def test_pseudo_conv_roundtrip_resolution(rng):
    """down then up restores the pixel count (the autoencoder contract)."""
    nside = 8
    n_pix = hp.nside2npix(nside)
    m = jnp.asarray(rng.normal(size=(2, n_pix, 3)), jnp.float32)
    down = HealpyPseudoConv(p=1, Fout=4)
    up = HealpyPseudoConv_Transpose(p=1, Fout=3)
    vd = down.init(jax.random.key(0), m)
    z = down.apply(vd, m)
    vu = up.init(jax.random.key(1), z)
    assert up.apply(vu, z).shape == (2, n_pix, 3)
