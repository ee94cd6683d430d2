"""Compute-op tests: ELLPACK SpMV vs scipy, polynomial bases vs dense
matrix polynomials, gradients, attention kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from deepsphere_tpu.graph import graph_from_laplacian
from deepsphere_tpu.ops import (
    bernstein_basis,
    chebyshev_basis,
    ellpack_spmv,
    graph_conv,
    monomial_basis,
)
from deepsphere_tpu.ops.attention import edge_sparse_attention, scaled_dot_product_attention


def _random_graph(rng, n=12):
    R = rng.normal(size=(n, n))
    L = R @ R.T / n
    return graph_from_laplacian(L)


def test_ellpack_spmv_matches_scipy(rng):
    g = _random_graph(rng)
    idx, val = g.ellpack(scale=0.75)
    Lr = g.rescaled(0.75)
    x = rng.normal(size=(12, 7)).astype(np.float32)
    y = np.asarray(ellpack_spmv(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(x)))
    assert np.allclose(y, Lr @ x, atol=1e-4)


def test_chebyshev_basis_matches_dense(rng):
    g = _random_graph(rng, n=10)
    idx, val = g.ellpack(scale=0.75)
    Lt = g.rescaled(0.75).toarray()
    x = rng.normal(size=(10, 3)).astype(np.float32)
    K = 5
    basis = np.asarray(chebyshev_basis(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(x), K))
    # T_0 = x, T_1 = Lt x, T_k = 2 Lt T_{k-1} - T_{k-2}
    want = [x, Lt @ x]
    for _ in range(2, K):
        want.append(2 * Lt @ want[-1] - want[-2])
    assert np.allclose(basis, np.stack(want), atol=1e-3)


def test_monomial_basis_matches_dense(rng):
    g = _random_graph(rng, n=10)
    idx, val = g.ellpack(scale=1.0)
    Lt = g.rescaled(1.0).toarray()
    x = rng.normal(size=(10, 3)).astype(np.float32)
    K = 4
    basis = np.asarray(monomial_basis(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(x), K))
    want = [x]
    for _ in range(1, K):
        want.append(Lt @ want[-1])
    assert np.allclose(basis, np.stack(want), atol=1e-3)


def test_bernstein_basis_matches_dense(rng):
    from scipy.special import comb

    g = _random_graph(rng, n=8)
    idx, val = g.ellpack(scale=0.75)
    Lt = g.rescaled(0.75).toarray()
    x = rng.normal(size=(8, 2)).astype(np.float32)
    K = 3
    basis = np.asarray(bernstein_basis(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(x), K + 1))
    I = np.eye(8)
    for i in range(K + 1):
        theta = comb(K, i) / 2**K
        term = theta * np.linalg.matrix_power(2 * I - Lt, K - i) @ np.linalg.matrix_power(Lt, i) @ x
        assert np.allclose(basis[i], term, atol=1e-3), i


def test_graph_conv_kernel_layout(rng):
    """The flattened feature index must be Fin-major, term-minor — parity
    with the reference kernel layout (``gnn_layers.py:144-150`` confirmed by
    ``healpy_networks.py:199-204``)."""
    g = _random_graph(rng, n=6)
    idx, val = g.ellpack(scale=0.75)
    Lt = g.rescaled(0.75).toarray()
    B, M, Fin, Fout, K = 2, 6, 3, 4, 3
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    kernel = rng.normal(size=(Fin * K, Fout)).astype(np.float32)

    from deepsphere_tpu.ops.spmv import chebyshev_basis as basis_fn

    y = np.asarray(
        graph_conv(
            lambda x2d, nt: basis_fn(jnp.asarray(idx), jnp.asarray(val), x2d, nt),
            jnp.asarray(x), jnp.asarray(kernel), K,
        )
    )

    # dense reference: T_k per batch, weight row index f*K + k
    Ts = [np.eye(M), Lt]
    for _ in range(2, K):
        Ts.append(2 * Lt @ Ts[-1] - Ts[-2])
    want = np.zeros((B, M, Fout))
    W = kernel.reshape(Fin, K, Fout)
    for f in range(Fin):
        for k in range(K):
            want += (Ts[k] @ x[:, :, f][..., None]) * W[f, k][None, None, :]
    assert np.allclose(y, want, atol=1e-3)


def test_spmv_gradients(rng):
    g = _random_graph(rng, n=6)
    idx, val = g.ellpack(scale=0.75)
    Lt = g.rescaled(0.75).toarray().astype(np.float64)
    x = rng.normal(size=(6, 2))

    def f(x):
        return jnp.sum(ellpack_spmv(jnp.asarray(idx), jnp.asarray(val, dtype=jnp.float64), x) ** 2)

    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    want = 2 * Lt.T @ (Lt @ x)
    assert np.allclose(gx, want, atol=1e-6)


def test_dense_attention_softmax_rows(rng):
    q = jnp.asarray(rng.normal(size=(2, 2, 5, 4)).astype(np.float32))
    out, w = scaled_dot_product_attention(q, q, q)
    assert out.shape == (2, 2, 5, 4)
    assert np.allclose(np.asarray(w).sum(axis=-1), 1.0, atol=1e-5)


def test_edge_sparse_attention_matches_dense_on_full_graph(rng):
    """With a complete edge set, edge-sparse attention == dense attention."""
    B, H, M, D = 2, 2, 5, 3
    q = rng.normal(size=(B, H, M, D)).astype(np.float32)
    k = rng.normal(size=(B, H, M, D)).astype(np.float32)
    v = rng.normal(size=(B, H, M, D)).astype(np.float32)
    edges = np.array([(i, j) for i in range(M) for j in range(M)], dtype=np.int64)
    out_sparse = np.asarray(
        edge_sparse_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(edges), M)
    )
    out_dense, _ = scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert np.allclose(out_sparse, np.asarray(out_dense), atol=1e-5)


def test_edge_sparse_attention_masks(rng):
    """Restricting edges changes the result vs dense (mask actually applies)."""
    B, H, M, D = 1, 1, 6, 4
    q = rng.normal(size=(B, H, M, D)).astype(np.float32)
    edges = np.array([(i, i) for i in range(M)], dtype=np.int64)  # self-loops only
    out = np.asarray(
        edge_sparse_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), jnp.asarray(edges), M)
    )
    # with only self edges, output == v
    assert np.allclose(out, q, atol=1e-5)
