"""Single-launch Pallas strip builder: exact parity with the XLA
assembly (`_strip_arrays`) in interpret mode.

The builder replaces the op-launch-bound XLA halo-strip assembly on the
conv hot path (see ops/pallas_strips.py); its output must be BIT
IDENTICAL — the fused kernel DMAs these arrays directly into its band
windows, and the TF2-parity suite rides on the conv's exactness.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops import pallas_stencil as ps
from deepsphere_tpu.ops.pallas_strips import (
    build_strips_pallas,
    strip_builder_available,
)
from deepsphere_tpu.ops.stencil import cface_embed


def _embedded(rng, nside, h, C):
    n_pix = 12 * nside * nside
    x = jnp.asarray(rng.normal(size=(1, n_pix, C)), jnp.float32)
    xc = cface_embed(x, nside, h).reshape(C, 12, nside, -1)
    return xc


@pytest.mark.parametrize("nside,K,C", [(8, 5, 3), (16, 2, 1), (16, 5, 8),
                                       (32, 3, 4)])
def test_builder_matches_xla(rng, nside, K, C):
    g = build_sphere_graph(nside, k=8, method="grid")
    st = g.face_stencil(0.75, n_steps=K - 1)
    xc = _embedded(rng, nside, st.n_steps, C)
    assert strip_builder_available(st, xc)
    want = ps._strip_arrays(st, xc)
    got = build_strips_pallas(st, xc, interpret=True)
    for name, w, g_ in zip(("top", "bot", "ls"), want, got):
        assert w.shape == g_.shape, name
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g_),
                                      err_msg=name)


def test_builder_radius2(rng):
    """Radius-2 capture-window stencil (the k=20 kNN path): h = 2(K-1)."""
    g = build_sphere_graph(16, k=20, method="grid")
    st = g.face_stencil(0.75, n_steps=2 * (5 - 1))
    assert st.radius == 2
    xc = _embedded(rng, 16, st.n_steps, 2)
    if not strip_builder_available(st, xc):
        pytest.skip("builder does not cover this geometry")
    want = ps._strip_arrays(st, xc)
    got = build_strips_pallas(st, xc, interpret=True)
    for name, w, g_ in zip(("top", "bot", "ls"), want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g_),
                                      err_msg=name)


def test_dispatcher_picks_builder_only_when_eligible(rng):
    g = build_sphere_graph(8, k=8, method="grid")
    st = g.face_stencil(0.75, n_steps=4)
    xc = _embedded(rng, 8, 4, 2)
    assert strip_builder_available(st, xc)
    # bf16 I/O not covered yet
    assert not strip_builder_available(st, xc.astype(jnp.bfloat16))


def test_conv_chain_with_builder_strips(rng):
    """End-to-end: the fused conv with builder strips equals the conv
    with XLA strips (the whole strips contract, via the public entry)."""
    import deepsphere_tpu.config as cfg
    from deepsphere_tpu.ops.stencil import stencil_tables

    g = build_sphere_graph(8, k=8, method="grid")
    K, B, Fin, Fout = 3, 2, 2, 2
    st = g.face_stencil(0.75, n_steps=K - 1)
    tables = {k: jnp.asarray(v) for k, v in stencil_tables(st).items()}
    xc = _embedded(rng, 8, st.n_steps, B * Fin)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)
    try:
        cfg.set_strips_mode("xla")
        y_ref = ps.fused_stencil_conv_cfp(st, tables, xc, kern, K, "cheby",
                                          B, interpret=True)
        cfg.set_strips_mode("pallas")
        y = ps.fused_stencil_conv_cfp(st, tables, xc, kern, K, "cheby",
                                      B, interpret=True)
    finally:
        cfg.set_strips_mode("auto")
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y))
