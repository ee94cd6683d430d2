"""Fused Pallas stencil kernel: interpret-mode parity on CPU.

The kernel's compiled-vs-interpret equivalence is separately verified on
real TPU hardware; these tests pin the kernel's math (forward, both
backward passes, the corner-correction ball) against the gather path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepsphere_tpu.config as cfg
from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops import spmv
from deepsphere_tpu.ops.pallas_stencil import fused_available
from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables


@pytest.fixture(autouse=True)
def _pallas_on():
    cfg.set_use_pallas("on")  # interpret mode on CPU
    yield
    cfg.set_use_pallas("auto")


@pytest.fixture(scope="module")
def graph():
    return build_sphere_graph(8, k=8, method="grid")


def _ref_conv(g, kind, x, kern, K, scale):
    idx, val = g.ellpack(scale)
    basis = {"cheby": spmv.chebyshev_basis, "mono": spmv.monomial_basis}[kind]
    return spmv.graph_conv(
        lambda z, nt: basis(jnp.asarray(idx), jnp.asarray(val), z, nt),
        x, kern, K,
    )


@pytest.mark.parametrize("kind,K,scale", [("cheby", 5, 0.75), ("mono", 3, 1.0)])
def test_fused_forward_matches_gather(rng, graph, kind, K, scale):
    st = graph.face_stencil(scale, n_steps=K - 1)
    assert fused_available(st, kind, K)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    B, Fin, Fout = 3, 2, 4
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    y_ref = _ref_conv(graph, kind, x, kern, K, scale)
    y = stencil_graph_conv(st, x, kern, K, kind, tables=tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


def test_fused_gradients_match(rng, graph):
    K, B, Fin, Fout = 4, 2, 2, 3
    st = graph.face_stencil(0.75, n_steps=K - 1)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss_fused(x, k):
        return jnp.sum(stencil_graph_conv(st, x, k, K, "cheby", tables=tables) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_ref_conv(graph, "cheby", x, k, K, 0.75) ** 2)

    gx1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(x, kern)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=2e-4, atol=2e-3)


def test_corner_correction_engages(graph):
    """The deep stencil must record corrupt rows + a recompute ball."""
    st = graph.face_stencil(0.75, n_steps=4)
    assert st.corrupt_rows.shape[0] > 0
    assert st.corr_src.shape[0] >= st.corrupt_rows.shape[0]
    # correction indices are consistent
    assert st.corr_out_ball.shape == st.corr_out_face.shape


def test_fused_not_used_for_bernstein(graph):
    st = graph.face_stencil(0.75, n_steps=3)
    assert not fused_available(st, "bern", 4)


@pytest.mark.slow
def test_model_training_through_fused_path(rng, graph):
    """End-to-end: a model trains through the fused kernel (interpret)."""
    import deepsphere_tpu as ds
    from deepsphere_tpu.nn import healpy_layers as hp_nn

    nside = 8
    npix = 12 * nside * nside
    model = ds.HealpyGCNN(nside=nside, indices=np.arange(npix), layers=[
        hp_nn.HealpyChebyshev(K=3, Fout=4, activation="relu"),
        hp_nn.HealpyPool(p=1),
        hp_nn.Flatten(),
        hp_nn.Dense(2),
    ])
    x = rng.normal(size=(8, npix, 1)).astype(np.float32)
    y = (np.arange(8) % 2).astype(np.int64)
    model.build((8, npix, 1))
    model.compile(optimizer=1e-2, loss="sparse_categorical_crossentropy_from_logits")
    h = model.fit(x, y, batch_size=8, epochs=3, verbose=0)
    assert np.isfinite(h["loss"]).all()


@pytest.mark.slow
def test_fused_deep_halo_window_margin(rng):
    """K=10 (quick_start order): halo depth 9 needs the R=16 window margin
    path; nside=16 is the boundary case (nside == R)."""
    g16 = build_sphere_graph(16, k=8, method="grid")
    K = 10
    st = g16.face_stencil(0.75, n_steps=K - 1)
    assert fused_available(st, "cheby", K)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    B, Fin, Fout = 2, 2, 3
    x = jnp.asarray(rng.normal(size=(B, g16.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    y_ref = _ref_conv(g16, "cheby", x, kern, K, 0.75)
    y = stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3)

    # nside=8 < R=16: fused must refuse, the conv still works via fallback
    g8 = build_sphere_graph(8, k=8, method="grid")
    st8 = g8.face_stencil(0.75, n_steps=K - 1)
    assert not fused_available(st8, "cheby", K)


@pytest.mark.slow
def test_fused_padded_halo_radius1_K10(rng):
    """Round-4 un-gating: the quick_start architecture (radius-1 K=10,
    needed halo 9) is built through :meth:`deep_stencil`, which pads the
    unaligned depth up to the sublane tile (n_steps=16) so the compiled
    DMA geometry lands in the Mosaic-verified 8-aligned class.  The 7
    extra margin rows carry valid-but-unused halo; the recursion must
    stay exact (forward AND gradients vs the gather path)."""
    g = build_sphere_graph(32, k=8, method="grid")
    K = 10
    st = g.deep_stencil(0.75, K)
    assert st is not None and st.radius == 1 and st.n_steps == 16
    assert fused_available(st, "cheby", K)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    B, Fin, Fout = 2, 2, 3
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    y_ref = _ref_conv(g, "cheby", x, kern, K, 0.75)
    y = stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3)

    def loss_fused(x, k):
        return jnp.sum(stencil_graph_conv(st, x, k, K, "cheby", tables=tables) ** 2)

    def loss_ref(x, k):
        return jnp.sum(_ref_conv(g, "cheby", x, k, K, 0.75) ** 2)

    gx1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(x, kern)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=2e-3, atol=2e-2)


@pytest.mark.slow
def test_dot_contraction_matches_axpy(rng, graph):
    """The MXU matmul contraction (used at large B*Fin*Fout*K, where the
    scalar-AXPY unroll would explode Mosaic compile time) is numerically
    identical to the AXPY path — forward and both gradients."""
    K, B, Fin, Fout = 4, 2, 3, 3
    st = graph.face_stencil(0.75, n_steps=K - 1)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss(kern, x):
        y = stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)
        return jnp.sum(jnp.sin(y)), y

    outs = {}
    for mode in ("axpy", "dot"):
        cfg.set_contract_mode(mode)
        try:
            (l, y), (gk, gx) = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(kern, x)
            outs[mode] = (np.asarray(y), np.asarray(gk), np.asarray(gx))
        finally:
            cfg.set_contract_mode("auto")
    for a, b in zip(outs["axpy"], outs["dot"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_dw_matches_two_kernel_path(rng, graph):
    """The fused dx+dW backward (adjoint trick: dW = <x, T_k(L~)dy>) must
    match the two-kernel reference path bit-for-bit-ish — including the
    corner-correction terms, which the two paths decompose differently
    (zeroing dy rows vs zeroing x rows plus the symmetric ball term)."""
    K, B, Fin, Fout = 4, 2, 2, 3
    st = graph.face_stencil(0.75, n_steps=K - 1)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss(x, k):
        return jnp.sum(
            stencil_graph_conv(st, x, k, K, "cheby", tables=tables) ** 2
        )

    assert cfg.fused_dw
    gx1, gk1 = jax.grad(loss, argnums=(0, 1))(x, kern)
    cfg.set_fused_dw(False)
    try:
        gx2, gk2 = jax.grad(loss, argnums=(0, 1))(x, kern)
    finally:
        cfg.set_fused_dw(True)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gk1), np.asarray(gk2), rtol=1e-5, atol=1e-4
    )


@pytest.mark.slow  # opt-in mode; on-chip checks live in tools/tpu_checks.py
def test_bf16_band_mode_close_to_f32(rng, graph):
    """config.conv_dtype="bfloat16" runs the recursion in bf16 (half the
    VMEM traffic) with f32 contraction accumulation; outputs and gradients
    must track the f32 path within bf16 resolution (~1e-2 relative)."""
    K, B, Fin, Fout = 5, 2, 2, 3
    st = graph.face_stencil(0.75, n_steps=K - 1)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss(x, k):
        y = stencil_graph_conv(st, x, k, K, "cheby", tables=tables)
        return jnp.sum(y ** 2), y

    (_, y32), (gx32, gk32) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True
    )(x, kern)
    assert cfg.conv_dtype == "float32"
    cfg.set_conv_dtype("bfloat16")
    try:
        (_, y16), (gx16, gk16) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(x, kern)
    finally:
        cfg.set_conv_dtype("float32")
    for a, b in ((y32, y16), (gx32, gx16), (gk32, gk16)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 3e-2 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol)


@pytest.mark.slow  # opt-in mode; on-chip checks live in tools/tpu_checks.py
def test_bf16_io_mode_close_to_f32(rng):
    """config.conv_dtype="bfloat16_io" (stage B) keeps the conv's HBM
    arrays in bf16: activations, halo strips, weight planes and outputs —
    DMA bytes halve on top of the stage-A band mode.  The kernel widens
    its window margin to R = roundup(h, 16) (bf16 DMA row slices must be
    16-aligned), so this needs nside % 16 == 0; outputs/gradients must
    track f32 within bf16 resolution.  Both the prebuilt R16 bf16 weight
    table (stencil_tables(bf16_io=True)) and the in-graph repack fallback
    are exercised."""
    from deepsphere_tpu.ops.pallas_stencil import cfp_io_available

    K, B, Fin, Fout = 5, 2, 2, 3
    g16 = build_sphere_graph(16, k=8, method="grid")
    st = g16.face_stencil(0.75, n_steps=K - 1)
    assert cfp_io_available(st)
    t32 = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    t16 = {
        k: jnp.asarray(v) for k, v in stencil_tables(st, bf16_io=True).items()
    }
    assert "weights_bf16" in t16
    x = jnp.asarray(rng.normal(size=(B, g16.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss(x, k, tables):
        y = stencil_graph_conv(st, x, k, K, "cheby", tables=tables)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (_, y32), (gx32, gk32) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True
    )(x, kern, t32)
    cfg.set_conv_dtype("bfloat16_io")
    try:
        (_, y16), (gx16, gk16) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(x, kern, t16)
        (_, y16b), _ = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(x, kern, t32)  # no prebuilt bf16 table -> in-graph repack
    finally:
        cfg.set_conv_dtype("float32")
    np.testing.assert_allclose(
        np.asarray(y16b, np.float32), np.asarray(y16, np.float32),
        atol=1e-6,
    )
    for a, b in ((y32, y16), (gx32, gx16), (gk32, gk16)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        tol = 3e-2 * max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol)


def test_lap_chain_deep_radius_matches_gather(rng):
    """k=40 (radius-3) deep-k conv via the LAP CHAIN — single-lap fused
    kernels chained at the XLA level on the SHALLOW (n_steps == radius)
    stencil — against the ELLPACK gather path.  The deep one-shot fused
    form is performance-gated off at radius >= 3 (PERFORMANCE.md round 4:
    30.92 ms one-shot vs 11.43 ms XLA at k=40@128); the single-lap form
    measured fast on-chip (2.72 ms @ nside=64, probe_r3_constructs)."""
    from deepsphere_tpu.ops.stencil import lap_chain_available

    K, B, Fin, Fout = 4, 2, 2, 3
    g = build_sphere_graph(16, k=40, method="grid")
    st = g.face_stencil(0.75)
    assert st is not None and st.radius == 3 and st.n_steps == 3
    assert lap_chain_available(st, "cheby", K)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(
        rng.normal(scale=0.1, size=(Fin * K, Fout)), jnp.float32)

    y_ref = _ref_conv(g, "cheby", x, kern, K, 0.75)
    y = stencil_graph_conv(st, x, kern, K, "cheby", tables=tables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


@pytest.mark.slow
def test_lap_chain_gradients_match(rng):
    """Gradients through the lap chain (each lap's custom VJP composes
    with the XLA-level recurrence) vs autodiff of the gather path."""
    from deepsphere_tpu.ops.stencil import lap_chain_available

    K, B, Fin, Fout = 3, 2, 2, 2
    g = build_sphere_graph(16, k=40, method="grid")
    st = g.face_stencil(0.75)
    assert lap_chain_available(st, "cheby", K)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(
        rng.normal(scale=0.1, size=(Fin * K, Fout)), jnp.float32)

    def loss_st(x, kern):
        return jnp.sum(
            stencil_graph_conv(st, x, kern, K, "cheby", tables=tables) ** 2)

    def loss_ref(x, kern):
        return jnp.sum(_ref_conv(g, "cheby", x, kern, K, 0.75) ** 2)

    dx, dk = jax.grad(loss_st, argnums=(0, 1))(x, kern)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_xla_bwd_matches_pallas_backward(rng):
    """The deep-halo (h > 8) compiled backward runs on the per-step XLA
    path (_xla_bwd) while the forward stays fused — the Pallas backward
    kernels hard-fault the worker at quick_start train shapes (round-5
    isolation).  Pin _xla_bwd's dx/dW against autodiff through the
    interpret-mode fused path (which keeps the Pallas backward)."""
    import deepsphere_tpu.ops.pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import cface_embed

    K, B, Fin, Fout = 10, 2, 2, 3
    g = build_sphere_graph(32, k=8, method="grid")
    st = g.deep_stencil(0.75, K)
    assert st.n_steps == 16
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    n, h = st.nside, st.n_steps
    x = jnp.asarray(rng.normal(size=(B, g.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(
        rng.normal(scale=0.1, size=(Fin * K, Fout)), jnp.float32)
    xc = cface_embed(x, n, h).reshape(B * Fin, 12, n, -1)

    def loss(xc, kern):
        y = ps.fused_stencil_conv_cfp(st, tables, xc, kern, K, "cheby", B,
                                      interpret=True)
        return jnp.sum(y[:, :, :, h : h + n] ** 2)

    (gx_ref, gk_ref) = jax.grad(loss, argnums=(0, 1))(xc, kern)

    y = ps.fused_stencil_conv_cfp(st, tables, xc, kern, K, "cheby", B,
                                  interpret=True)
    dy = (2.0 * y).at[:, :, :, :h].set(0.0).at[:, :, :, h + n :].set(0.0)
    kernel_t = (kern.reshape(Fin, K, Fout).transpose(2, 1, 0)
                .reshape(Fout * K, Fin))
    dx, dwk = ps._xla_bwd(st, tables, dy, xc, kernel_t, K, "cheby",
                          B, Fin, Fout)
    dkern = jnp.transpose(dwk, (1, 0, 2)).reshape(Fin * K, Fout)

    # interior rows only: the pallas dx fills halo lanes with garbage-free
    # zeros there too, but compare where it matters
    np.testing.assert_allclose(
        np.asarray(dx[:, :, :, h : h + n]),
        np.asarray(gx_ref[:, :, :, h : h + n]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(dkern), np.asarray(gk_ref), rtol=2e-3, atol=2e-2)
