"""Attention layers vs the reference test strategy
(tests/test_gnn_transformers.py): shape contracts eagerly and under jit,
plus numeric pinning of the attention kernels the reference never checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.nn.transformers import GraphTransformer, GraphViT, MultiHeadAttention
from deepsphere_tpu.ops.attention import edge_sparse_attention, scaled_dot_product_attention
from deepsphere_tpu.sphere import healpix as hp


def test_graph_vit(rng):
    nside = 16
    n_pix = hp.nside2npix(nside)
    m_in = jnp.asarray(rng.normal(size=(3, n_pix, 7)), jnp.float32)
    p, key_dim, num_heads = 2, 8, 4
    layer = GraphViT(p=p, key_dim=key_dim, num_heads=num_heads, n_layers=3)
    v = layer.init(jax.random.key(11), m_in)
    out = layer.apply(v, m_in)
    assert out.shape == (3, n_pix // 4**p, num_heads * key_dim)

    # under jit (the reference's tf.function-compatibility check); jit may
    # reassociate f32 reductions, so compare loosely
    out2 = jax.jit(lambda v, x: layer.apply(v, x))(v, m_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-4)

    with pytest.raises(IOError):
        GraphViT(p=1, key_dim=8, num_heads=2)  # requires p > 1


def test_graph_transformer(rng):
    nside = 8
    n_pix = hp.nside2npix(nside)
    m_in = jnp.asarray(rng.normal(size=(3, n_pix, 7)), jnp.float32)
    graph = build_sphere_graph(nside, k=20, method="knn")
    layer = GraphTransformer.from_graph(graph, key_dim=8, num_heads=4, n_layers=2)
    v = layer.init(jax.random.key(11), m_in)
    out = layer.apply(v, m_in)
    assert out.shape == (3, n_pix, 32)
    out2 = jax.jit(lambda v, x: layer.apply(v, x))(v, m_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-4)


def test_dense_attention_numerics(rng):
    """softmax(QK^T / sqrt(d)) V — checked against a numpy implementation."""
    q = rng.normal(size=(2, 4, 8)).astype(np.float32)
    k = rng.normal(size=(2, 6, 8)).astype(np.float32)
    v = rng.normal(size=(2, 6, 5)).astype(np.float32)
    out, attn = scaled_dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(8)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), w @ v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), w, atol=1e-5)


def test_edge_sparse_attention_matches_dense_on_full_graph(rng):
    """With the complete edge set, edge-sparse attention == dense attention
    (the reference's sparse kernel is unstabilized, gnn_transformers.py:95;
    ours subtracts the max — same mathematical result)."""
    N, d, B, H = 6, 4, 2, 3
    q = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    full_edges = np.stack(np.meshgrid(np.arange(N), np.arange(N), indexing="ij"), -1)
    full_edges = full_edges.reshape(-1, 2)
    out_sparse = edge_sparse_attention(q, k, v, jnp.asarray(full_edges), N)
    out_dense, _ = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), atol=1e-5
    )


def test_mha_block_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 16)), jnp.float32)
    layer = MultiHeadAttention(d_model=16, num_heads=4)
    v = layer.init(jax.random.key(0), x)
    assert layer.apply(v, x).shape == (2, 10, 16)
