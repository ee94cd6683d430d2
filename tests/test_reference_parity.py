"""Layer-by-layer numerical parity vs the ACTUAL TF2 reference.

The north-star metric (BASELINE.md): per-layer max-abs error vs the TF2
reference < 1e-5.  Every other test in this suite checks against scipy
re-derivations of the math; THIS file imports
``/root/reference/src/deepsphere`` itself (TF 2.x is installed; healpy and
pygsp are stubbed in ``sys.modules`` — the graph layers only need TF + scipy
once ``deepsphere.utils`` imports), copies weights across, and compares
outputs layer by layer with shared Laplacians built by OUR graph backend.

Documented deliberate deviations (each pinned by its own test):
* Bernstein i=K term: the reference reuses a stale buffer
  (``gnn_layers.py:542-554``); we implement the correct math by default and
  reproduce the quirk bit-exactly under ``BernsteinConv(ref_quirks=True)``.
* Sparse-attention softmax: the reference skips max-subtraction
  (``gnn_transformers.py:95-103``); ours is stabilized by default with a
  ``stabilized=False`` parity escape hatch.
"""

import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

# single-threaded TF: oneDNN's multi-threaded reductions reorder f32 sums
# run to run, which flakes the layer_norm residual case across its 5e-5
# tolerance (observed ~1/6 full-file runs); the box is 1-core anyway
try:
    tf.config.threading.set_intra_op_parallelism_threads(1)
    tf.config.threading.set_inter_op_parallelism_threads(1)
except RuntimeError:  # context already initialized (e.g. pytest-xdist)
    pass

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepsphere_tpu.graph import build_sphere_graph  # noqa: E402


def _install_reference(monkeypatch=None):
    """Make ``/root/reference/src/deepsphere`` importable: healpy/pygsp are
    imported at module scope there (``utils.py:3``, ``healpy_networks.py:4-5``)
    but the graph layers never call them, so module stubs suffice (backed by
    our own healpix core where a function is actually exercised)."""
    if "deepsphere" in sys.modules:
        return sys.modules["deepsphere"]
    from deepsphere_tpu.sphere import healpix as hpx

    hp_stub = types.ModuleType("healpy")
    hp_stub.nside2npix = hpx.nside2npix
    hp_stub.npix2nside = hpx.npix2nside
    hp_stub.isnsideok = lambda nside, nest=False: hpx.isnsideok(nside, nest=nest)
    hp_stub.ud_grade = hpx.ud_grade
    hp_stub.pix2ang = hpx.pix2ang
    hp_stub.ang2pix = hpx.ang2pix
    hp_stub.pix2vec = hpx.pix2vec
    hp_stub.UNSEEN = -1.6375e30
    sys.modules["healpy"] = hp_stub

    class SphereHealpix:
        """pygsp.graphs.SphereHealpix backed by OUR kNN graph builder —
        enough surface (.L, .A) for the reference HealpyGCNN assembler
        (``healpy_networks.py:110-120``) to build real models, which lets
        tests exercise the reference's save_weights deployment artifact
        end to end."""

        def __init__(self, subdivisions, indexes=None, nest=True, k=8,
                     lap_type="normalized"):
            g = build_sphere_graph(
                int(subdivisions),
                None if indexes is None else np.asarray(indexes),
                k=k, lap_type=lap_type, method="knn",
            )
            g._materialize()
            self.L = g.L
            self.A = g.A

    pygsp = types.ModuleType("pygsp")
    pygsp_filters = types.ModuleType("pygsp.filters")
    pygsp_graphs = types.ModuleType("pygsp.graphs")
    pygsp_filters.Chebyshev = type("Chebyshev", (), {})
    pygsp_graphs.SphereHealpix = SphereHealpix
    pygsp.filters = pygsp_filters
    pygsp.graphs = pygsp_graphs
    sys.modules["pygsp"] = pygsp
    sys.modules["pygsp.filters"] = pygsp_filters
    sys.modules["pygsp.graphs"] = pygsp_graphs

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import deepsphere as ref

    return ref


@pytest.fixture(scope="module")
def ref():
    return _install_reference()


@pytest.fixture(scope="module")
def graphs():
    """Shared small graphs: the generic kNN build (ELLPACK conv path) and
    the grid build (stencil conv path)."""
    out = {}
    for method in ("knn", "grid"):
        g = build_sphere_graph(8, k=8, method=method)
        g._materialize()
        out[method] = g
    return out


def _jx(a):
    return jnp.asarray(np.asarray(a), jnp.float32)


def _apply_ours(layer, params, x, training=False, batch_stats=None):
    """Init our flax layer, overwrite params with the TF weights, apply."""
    variables = layer.init(jax.random.key(0), _jx(x), training=False)
    variables = dict(variables)
    variables["params"] = params
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if training:
        y, upd = layer.apply(variables, _jx(x), training=True,
                             mutable=["batch_stats"])
        return np.asarray(y), jax.tree_util.tree_map(
            np.asarray, upd.get("batch_stats", {})
        )
    return np.asarray(layer.apply(variables, _jx(x), training=False)), None


def _bn_params_from_tf(bn):
    return {
        "mean": np.asarray(bn.moving_mean.numpy()),
        "var": np.asarray(bn.moving_variance.numpy()),
    }


# ---------------------------------------------------------------------------
# polynomial graph convolutions (gnn_layers.py:12-161, 164-309, 416-572)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["knn", "grid"])
@pytest.mark.parametrize("K,use_bias,use_bn,act", [
    (1, False, False, None),
    (5, True, False, "relu"),
    (5, False, True, None),
])
def test_chebyshev_parity(ref, graphs, rng, method, K, use_bias, use_bn, act):
    from deepsphere_tpu.nn.layers import ChebyshevConv

    g = graphs[method]
    B, M, Fin, Fout = 3, g.n_pixels, 3, 5
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)

    tf_layer = ref.gnn_layers.Chebyshev(
        L=g.L.copy(), K=K, Fout=Fout, use_bias=use_bias, use_bn=use_bn,
        activation=act,
    )
    y_ref = tf_layer(tf.constant(x), training=False).numpy()

    params = {"kernel": np.asarray(tf_layer.kernel.numpy())}
    if use_bias:
        params["bias"] = np.asarray(tf_layer.bias.numpy())
    ours = ChebyshevConv(graph=g, K=K, Fout=Fout, use_bias=use_bias,
                         use_bn=use_bn, activation=act,
                         conv_method="ellpack")
    y, _ = _apply_ours(ours, params, x)
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()

    if use_bn:
        # train mode: batch statistics + updated moving stats must agree
        y_ref_t = tf_layer(tf.constant(x), training=True).numpy()
        y_t, upd = _apply_ours(ours, params, x, training=True)
        assert np.abs(y_t - y_ref_t).max() < 1e-5
        ref_stats = _bn_params_from_tf(tf_layer.bn)
        np.testing.assert_allclose(upd["bn"]["mean"], ref_stats["mean"],
                                   atol=1e-6)
        np.testing.assert_allclose(upd["bn"]["var"], ref_stats["var"],
                                   atol=1e-6)


@pytest.mark.parametrize("method", ["knn", "grid"])
@pytest.mark.parametrize("K", [1, 4])
def test_monomial_parity(ref, graphs, rng, method, K):
    from deepsphere_tpu.nn.layers import MonomialConv

    g = graphs[method]
    B, M, Fin, Fout = 2, g.n_pixels, 2, 4
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    tf_layer = ref.gnn_layers.Monomial(L=g.L.copy(), K=K, Fout=Fout,
                                       use_bias=True)
    y_ref = tf_layer(tf.constant(x)).numpy()
    params = {
        "kernel": np.asarray(tf_layer.kernel.numpy()),
        "bias": np.asarray(tf_layer.bias.numpy()),
    }
    ours = MonomialConv(graph=g, K=K, Fout=Fout, use_bias=True,
                        conv_method="ellpack")
    y, _ = _apply_ours(ours, params, x)
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


@pytest.mark.parametrize("method", ["knn", "grid"])
@pytest.mark.parametrize("K", [2, 3])
def test_bernstein_quirk_parity(ref, graphs, rng, method, K):
    """With ``ref_quirks=True`` our Bernstein reproduces the reference's
    stale-buffer i=K term bit-for-bit; the default (correct math) must
    measurably DEVIATE — pinning that the deviation is deliberate."""
    from deepsphere_tpu.nn.layers import BernsteinConv

    g = graphs[method]
    B, M, Fin, Fout = 2, g.n_pixels, 2, 3
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    tf_layer = ref.gnn_layers.Bernstein(L=g.L.copy(), K=K, Fout=Fout)
    y_ref = tf_layer(tf.constant(x)).numpy()
    params = {"kernel": np.asarray(tf_layer.kernel.numpy())}

    quirk = BernsteinConv(graph=g, K=K, Fout=Fout, ref_quirks=True,
                          conv_method="ellpack")
    y_q, _ = _apply_ours(quirk, params, x)
    assert np.abs(y_q - y_ref).max() < 1e-5, np.abs(y_q - y_ref).max()

    correct = BernsteinConv(graph=g, K=K, Fout=Fout, conv_method="ellpack")
    y_c, _ = _apply_ours(correct, params, x)
    assert np.abs(y_c - y_ref).max() > 1e-3  # the quirk is real


@pytest.mark.parametrize("use_bn,norm_type,act_before", [
    (False, "batch_norm", False),
    (True, "batch_norm", False),
    (True, "layer_norm", True),
])
def test_residual_parity(ref, graphs, rng, use_bn, norm_type, act_before):
    from deepsphere_tpu.nn.layers import ResidualLayer

    g = graphs["knn"]
    B, M, F, K = 2, g.n_pixels, 3, 4
    x = rng.normal(size=(B, M, F)).astype(np.float32)
    tf_layer = ref.gnn_layers.GCNN_ResidualLayer(
        "CHEBY", {"L": g.L.copy(), "K": K, "Fout": F},
        activation="relu", act_before=act_before, use_bn=use_bn,
        norm_type=norm_type, alpha=0.7,
    )
    y_ref = tf_layer(tf.constant(x), training=False).numpy()

    params = {
        "layer1": {"kernel": np.asarray(tf_layer.layer1.kernel.numpy())},
        "layer2": {"kernel": np.asarray(tf_layer.layer2.kernel.numpy())},
    }
    if use_bn:
        # both Keras norm layers are affine by default (gamma/beta)
        params["bn1"] = {
            "scale": np.asarray(tf_layer.bn1.gamma.numpy()),
            "bias": np.asarray(tf_layer.bn1.beta.numpy()),
        }
        params["bn2"] = {
            "scale": np.asarray(tf_layer.bn2.gamma.numpy()),
            "bias": np.asarray(tf_layer.bn2.beta.numpy()),
        }
    ours = ResidualLayer(
        graph=g, layer_type="CHEBY", layer_kwargs={"K": K, "Fout": F, "conv_method": "ellpack"},
        activation="relu", act_before=act_before, use_bn=use_bn,
        norm_type=norm_type, alpha=0.7,
    )
    y, _ = _apply_ours(ours, params, x)
    # layer_norm divides by a per-pixel std, which amplifies the f32
    # summation-order noise between TF/oneDNN and XLA (~1e-6 per matvec)
    # past 1e-5 at a few pixels; the algorithm is identical.  1e-4 (not
    # 5e-5): XLA-CPU's threaded reductions reorder run to run, and the
    # worst pixel was observed flaking across 5e-5 in ~1/6 full-file runs.
    tol = 1e-4 if norm_type == "layer_norm" else 1e-5
    assert np.abs(y - y_ref).max() < tol, np.abs(y - y_ref).max()


# ---------------------------------------------------------------------------
# resolution layers (healpy_layers.py:20-216)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pool_type", ["MAX", "AVG"])
def test_pool_parity(ref, rng, pool_type):
    from deepsphere_tpu.nn.layers import HealpyPool

    B, M, F = 3, 768, 4
    x = rng.normal(size=(B, M, F)).astype(np.float32)
    tf_layer = ref.healpy_layers.HealpyPool(p=1, pool_type=pool_type)
    y_ref = tf_layer(tf.constant(x)).numpy()
    ours = HealpyPool(p=1, pool_type=pool_type)
    y = np.asarray(ours.apply({}, _jx(x)))
    assert np.abs(y - y_ref).max() < 1e-6


def test_pseudo_conv_parity(ref, rng):
    from deepsphere_tpu.nn.layers import HealpyPseudoConv

    B, M, Fin, Fout, p = 2, 768, 3, 5, 1
    fs = 4**p
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    tf_layer = ref.healpy_layers.HealpyPseudoConv(p=p, Fout=Fout)
    y_ref = tf_layer(tf.constant(x)).numpy()
    conv1d = tf_layer.filter
    k_tf = np.asarray(conv1d.kernel.numpy())  # (fs, Fin, Fout)
    b_tf = np.asarray(conv1d.bias.numpy())
    params = {"kernel": k_tf.reshape(fs * Fin, Fout), "bias": b_tf}
    ours = HealpyPseudoConv(p=p, Fout=Fout)
    y, _ = _apply_ours(ours, params, x)
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


def test_pseudo_conv_transpose_parity(ref, rng):
    from deepsphere_tpu.nn.layers import HealpyPseudoConv_Transpose

    B, M, Fin, Fout, p = 2, 192, 3, 4, 1
    fs = 4**p
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    tf_layer = ref.healpy_layers.HealpyPseudoConv_Transpose(p=p, Fout=Fout)
    y_ref = tf_layer(tf.constant(x)).numpy()
    convt = tf_layer.filter
    k_tf = np.asarray(convt.kernel.numpy())  # (1, fs, Fout, Fin)
    b_tf = np.asarray(convt.bias.numpy())
    params = {
        "kernel": k_tf[0].transpose(0, 2, 1),  # (fs, Fin, Fout)
        "bias": b_tf,
    }
    ours = HealpyPseudoConv_Transpose(p=p, Fout=Fout)
    y, _ = _apply_ours(ours, params, x)
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


# ---------------------------------------------------------------------------
# attention kernels (gnn_transformers.py:14-106)
# ---------------------------------------------------------------------------


def test_dense_attention_parity(ref, rng):
    from deepsphere_tpu.ops.attention import scaled_dot_product_attention

    B, Nq, Nk, D, Dv = 2, 6, 7, 4, 5
    q = rng.normal(size=(B, Nq, D)).astype(np.float32)
    k = rng.normal(size=(B, Nk, D)).astype(np.float32)
    v = rng.normal(size=(B, Nk, Dv)).astype(np.float32)
    out_ref, attn_ref = ref.gnn_transformers.scaled_dot_product_attention(
        tf.constant(q), tf.constant(k), tf.constant(v), None
    )
    out, attn = scaled_dot_product_attention(_jx(q), _jx(k), _jx(v))
    assert np.abs(np.asarray(out) - out_ref.numpy()).max() < 1e-5
    assert np.abs(np.asarray(attn) - attn_ref.numpy()).max() < 1e-5


def test_sparse_attention_parity(ref, graphs, rng):
    """Edge-sparse attention vs the reference, ``stabilized=False`` (the
    reference's softmax skips max-subtraction — gnn_transformers.py:95)."""
    from deepsphere_tpu.ops.attention import edge_sparse_attention

    g = graphs["knn"]
    edges = g.edge_idx  # (nnz, 2) (dst, src), sorted by dst
    M = g.n_pixels
    B, H, D = 2, 2, 4
    q = rng.normal(size=(B, H, M, D)).astype(np.float32)
    k = rng.normal(size=(B, H, M, D)).astype(np.float32)
    v = rng.normal(size=(B, H, M, D)).astype(np.float32)
    out_ref = ref.gnn_transformers.scaled_dot_product_sparse_attention(
        tf.constant(q), tf.constant(k), tf.constant(v),
        tf.constant(edges.astype(np.int64)),
    ).numpy()
    out = edge_sparse_attention(
        _jx(q), _jx(k), _jx(v), jnp.asarray(edges), num_nodes=M,
        stabilized=False,
    )
    assert np.abs(np.asarray(out) - out_ref).max() < 1e-5


def test_quickstart_workload_parity(ref, rng, tmp_path):
    """Workload-shape parity (BASELINE.md north star at the quick_start
    architecture, quick_start.ipynb cell 7): nside=64, K=10, 4 Chebyshev
    convs + 3 MAX pools, weights copied from freshly-built TF reference
    layers, compared at EVERY conv boundary through the model assembler's
    DEFAULT path (cface planner + stencil conv — not conv_method='ellpack').

    The TF chain uses OUR grid Laplacians at each resolution (the same L
    the assembler builds), so this isolates conv/BN/pool/layout numerics
    at production shape rather than graph-construction differences."""
    import deepsphere_tpu as ds
    from deepsphere_tpu.nn import healpy_layers as hp_nn

    nside = 64
    npix = 12 * nside * nside
    B = 2
    x = rng.normal(size=(B, npix, 1)).astype(np.float32)
    cache = str(tmp_path)

    conv_cfg = [
        dict(K=10, Fout=5, use_bias=True, use_bn=True, activation="relu"),
        dict(K=10, Fout=5, use_bias=True, use_bn=True, activation="relu"),
        dict(K=10, Fout=5, use_bias=True, use_bn=True, activation="relu"),
        dict(K=10, Fout=2),
    ]

    def make_layers(n_user_layers=None):
        out = []
        for ci, cfg in enumerate(conv_cfg):
            out.append(hp_nn.HealpyChebyshev(**cfg))
            if ci < 3:
                out.append(hp_nn.HealpyPool(p=1, pool_type="MAX"))
        return out if n_user_layers is None else out[:n_user_layers]

    # ---- TF reference chain with our Laplacians, recording conv outputs
    tf.random.set_seed(11)
    res = nside
    cur = tf.constant(x)
    tf_conv_out = []  # (layer_index, np output) at each conv boundary
    tf_params = {}  # our flax param key -> copied TF weights
    li = 0
    for ci, cfg in enumerate(conv_cfg):
        g = build_sphere_graph(res, k=8, method="grid", cache_dir=cache)
        g._materialize()
        tf_layer = ref.gnn_layers.Chebyshev(L=g.L.copy(), **cfg)
        cur = tf_layer(cur, training=False)
        tf_conv_out.append((li, cur.numpy()))
        p = {"kernel": np.asarray(tf_layer.kernel.numpy())}
        if cfg.get("use_bias"):
            p["bias"] = np.asarray(tf_layer.bias.numpy())
        tf_params[f"layers_layer_{li}"] = p
        li += 1
        if ci < 3:
            cur = ref.healpy_layers.HealpyPool(p=1, pool_type="MAX")(cur)
            res //= 2
            li += 1

    # ---- ours: prefix models through the DEFAULT assembler plan
    for boundary, (li, y_ref) in enumerate(tf_conv_out):
        model = ds.HealpyGCNN(
            nside=nside, indices=np.arange(npix),
            layers=make_layers(li + 1), graph_cache_dir=cache,
        )
        variables = dict(model.init(0, x))
        params = dict(variables["params"])
        for key, p in tf_params.items():
            if key in params:
                params[key] = p
        variables["params"] = params
        y = np.asarray(model.apply(variables, x, training=False))
        err = np.abs(y - y_ref).max()
        assert err < 1e-5, f"conv boundary {boundary}: max abs err {err}"


@pytest.mark.parametrize("method", ["knn", "grid"])
@pytest.mark.parametrize("kind,K", [("cheby", 5), ("mono", 4)])
def test_conv_parity_on_stencil_path(ref, graphs, rng, method, kind, K):
    """The DEFAULT conv path (face stencil; grid graphs directly, kNN via
    the capture window) must itself meet the <1e-5 reference target — the
    other conv tests pin conv_method='ellpack', which would otherwise
    leave the default path bounded only by the ellpack<1e-5 +
    stencil-vs-ellpack<2e-5 composition."""
    from deepsphere_tpu.nn.layers import ChebyshevConv, MonomialConv

    g = graphs[method]
    B, M, Fin, Fout = 2, g.n_pixels, 2, 3
    x = rng.normal(size=(B, M, Fin)).astype(np.float32)
    if kind == "cheby":
        tf_layer = ref.gnn_layers.Chebyshev(L=g.L.copy(), K=K, Fout=Fout)
        ours = ChebyshevConv(graph=g, K=K, Fout=Fout,
                             conv_method="stencil")
    else:
        tf_layer = ref.gnn_layers.Monomial(L=g.L.copy(), K=K, Fout=Fout,
                                           use_bias=True)
        ours = MonomialConv(graph=g, K=K, Fout=Fout, use_bias=True,
                            conv_method="stencil")
    y_ref = tf_layer(tf.constant(x), training=False).numpy()
    params = {"kernel": np.asarray(tf_layer.kernel.numpy())}
    if kind == "mono":
        params["bias"] = np.asarray(tf_layer.bias.numpy())
    y, _ = _apply_ours(ours, params, x)
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


# ---------------------------------------------------------------------------
# reference-checkpoint import (the reference's deployment unit:
# save_weights/load_weights in tests/test_healpy_networks.py:133-152)
# ---------------------------------------------------------------------------


def test_import_reference_checkpoint_end_to_end(ref, rng, tmp_path):
    """A reference HealpyGCNN (built through the real assembler, Laplacians
    from our kNN backend via the SphereHealpix stub) is trained 2 epochs in
    TF, exported with save_weights, imported with
    ``load_weights_from_reference`` into OUR model of the same
    architecture — end-to-end predictions must agree <1e-5 (BASELINE.md
    north star).  Covers conv kernels+bias+BN moving stats, residual
    blocks, pseudo-conv, and the dense head."""
    import deepsphere_tpu as ds
    from deepsphere_tpu.nn import healpy_layers as hp_nn

    ref_hp = ref.healpy_layers
    nside = 16
    npix = 12 * nside * nside
    B = 4
    x = rng.normal(size=(B, npix, 1)).astype(np.float32)

    tf.random.set_seed(7)
    tf_model = ref.healpy_networks.HealpyGCNN(
        nside=nside, indices=np.arange(npix), layers=[
            ref_hp.HealpyChebyshev(K=5, Fout=4, use_bias=True, use_bn=True,
                                   activation="relu"),
            ref_hp.HealpyPool(p=1, pool_type="MAX"),
            ref_hp.Healpy_ResidualLayer(
                "CHEBY", {"K": 3}, activation="relu", use_bn=True,
                norm_type="batch_norm"),
            ref_hp.HealpyMonomial(K=3, Fout=3, use_bias=True,
                                  activation="elu"),
            ref_hp.HealpyPseudoConv(p=1, Fout=6),
            tf.keras.layers.Flatten(),
            tf.keras.layers.Dense(2),
        ])
    tf_model.build(input_shape=(B, npix, 1))
    # 2 training epochs: weights AND BN moving statistics move off init
    xt = rng.normal(size=(16, npix, 1)).astype(np.float32)
    yt = (np.arange(16) % 2).astype(np.int64)
    tf_model.compile(
        optimizer=tf.keras.optimizers.Adam(1e-3),
        loss=tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True))
    tf_model.fit(xt, yt, batch_size=8, epochs=2, verbose=0)
    y_ref = tf_model(tf.constant(x), training=False).numpy()

    path = str(tmp_path / "ref.weights.h5")
    tf_model.save_weights(path)

    model = ds.HealpyGCNN(
        nside=nside, indices=np.arange(npix), graph_method="knn", layers=[
            hp_nn.HealpyChebyshev(K=5, Fout=4, use_bias=True, use_bn=True,
                                  activation="relu"),
            hp_nn.HealpyPool(p=1, pool_type="MAX"),
            hp_nn.Healpy_ResidualLayer(
                "CHEBY", {"K": 3}, activation="relu", use_bn=True,
                norm_type="batch_norm"),
            hp_nn.HealpyMonomial(K=3, Fout=3, use_bias=True,
                                 activation="elu"),
            hp_nn.HealpyPseudoConv(p=1, Fout=6),
            hp_nn.Flatten(),
            hp_nn.Dense(2),
        ])
    model.build((B, npix, 1))
    model.load_weights_from_reference(path)
    y = np.asarray(model(jnp.asarray(x), training=False))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()


def test_import_reference_checkpoint_transformers(ref, rng, tmp_path):
    """Checkpoint import for the attention families: Healpy_ViT (Conv1D
    patch embedding, positional embedding, dense-MHA blocks incl. the
    wq/wk/wv vs output-dense disambiguation) and Healpy_Transformer
    (edge-sparse MHA)."""
    import deepsphere_tpu as ds
    from deepsphere_tpu.nn import healpy_layers as hp_nn

    ref_hp = ref.healpy_layers
    nside = 8
    npix = 12 * nside * nside
    B = 2
    x = rng.normal(size=(B, npix, 1)).astype(np.float32)

    tf.random.set_seed(9)
    tf_model = ref.healpy_networks.HealpyGCNN(
        nside=nside, indices=np.arange(npix), layers=[
            ref_hp.Healpy_Transformer(key_dim=3, num_heads=2, n_layers=1),
            ref_hp.Healpy_ViT(p=2, key_dim=4, num_heads=2, n_layers=2),
            tf.keras.layers.Flatten(),
            tf.keras.layers.Dense(2),
        ])
    tf_model.build(input_shape=(B, npix, 1))
    y_ref = tf_model(tf.constant(x), training=False).numpy()
    path = str(tmp_path / "ref_attn.weights.h5")
    tf_model.save_weights(path)

    model = ds.HealpyGCNN(
        nside=nside, indices=np.arange(npix), graph_method="knn", layers=[
            hp_nn.Healpy_Transformer(key_dim=3, num_heads=2, n_layers=1),
            hp_nn.Healpy_ViT(p=2, key_dim=4, num_heads=2, n_layers=2),
            hp_nn.Flatten(),
            hp_nn.Dense(2),
        ])
    model.build((B, npix, 1))
    model.load_weights_from_reference(path)
    y = np.asarray(model(jnp.asarray(x), training=False))
    assert np.abs(y - y_ref).max() < 1e-5, np.abs(y - y_ref).max()
