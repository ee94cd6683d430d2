"""Visualization: projections, filter banks, model plot methods.

Mirrors the reference plot smoke-test strategy
(``tests/test_healpy_networks.py:14-88``: every plot method executed and
saved) plus numeric checks the reference lacks: projection grids hit the
right pixels and localized filters match a direct basis computation.
"""

import os

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deepsphere_tpu as ds
from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.nn import healpy_layers as hp_nn
from deepsphere_tpu.ops import spmv
from deepsphere_tpu.sphere import healpix as hp
from deepsphere_tpu.viz import (
    SphericalFilterBank,
    get_index_equator,
    gnomonic_pixels,
    mollweide_pixels,
    gnomview,
    mollview,
    plot_filters_gnomonic,
    plot_filters_section,
)

PLOT_DIR = os.path.join(os.path.dirname(__file__), "test_plots")
os.makedirs(PLOT_DIR, exist_ok=True)


def _save(fig, name):
    fig.savefig(os.path.join(PLOT_DIR, name))
    import matplotlib.pyplot as plt

    plt.close("all")


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------

def test_gnomonic_center_pixel():
    nside = 16
    # the projection center pixel must lie within one pixel radius of the
    # rot point (points exactly on pixel borders make equality ambiguous)
    resol = hp.nside2resol(nside)
    reso = hp.nside2resol(nside, arcmin=True) / 2  # grid spans ~5 pixels
    for lon, lat in [(0.0, 0.0), (45.0, 30.0), (180.0, -60.0)]:
        grid = gnomonic_pixels(nside, rot=(lon, lat), reso=reso, xsize=21)
        vec_c = np.array([
            np.cos(np.deg2rad(lat)) * np.cos(np.deg2rad(lon)),
            np.cos(np.deg2rad(lat)) * np.sin(np.deg2rad(lon)),
            np.sin(np.deg2rad(lat)),
        ])
        vec_p = hp.pix2vec(nside, grid[10, 10], nest=True)
        ang = np.arccos(np.clip(vec_p @ vec_c, -1, 1))
        assert ang < 1.5 * resol
        # and the grid must cover several neighboring pixels
        assert len(np.unique(grid)) >= 9


def test_mollweide_covers_sphere():
    nside = 8
    grid, ok = mollweide_pixels(nside, xsize=400)
    assert ok.sum() > 0.7 * ok.size * 0.78  # ellipse area fraction ~ pi/4
    seen = np.unique(grid[ok])
    assert len(seen) == hp.nside2npix(nside)  # every pixel rendered


def test_view_functions_smoke(rng):
    nside = 8
    m = rng.normal(size=hp.nside2npix(nside))
    import matplotlib.pyplot as plt

    fig = plt.figure()
    mollview(m, fig=fig, title="mollview")
    _save(fig, "mollview.png")
    fig = plt.figure()
    gnomview(m, fig=fig, rot=(10, 20), title="gnomview")
    _save(fig, "gnomview.png")


# ---------------------------------------------------------------------------
# equator indices (parity with plot.py:126-140)
# ---------------------------------------------------------------------------

def test_get_index_equator():
    nside = 8
    radius = 5
    idx, center = get_index_equator(nside, radius)
    assert len(idx) == 2 * radius + 1
    assert center == idx[radius]
    # all returned pixels sit on the equatorial ring band
    theta = hp.pix2ang(nside, idx, nest=True)[0]
    assert np.all(np.abs(theta - np.pi / 2) < 0.2)


# ---------------------------------------------------------------------------
# filter banks
# ---------------------------------------------------------------------------

def test_localize_matches_basis(rng):
    nside = 8
    g = build_sphere_graph(nside, k=8, method="grid")
    K, Fin, Fout = 4, 2, 3
    coeffs = rng.normal(size=(K, Fout, Fin)).astype(np.float32)
    bank = SphericalFilterBank(g, coeffs, kind="cheby")
    ind = 37
    maps = bank.localize(ind)
    assert maps.shape == (Fin, Fout, g.n_pixels)

    # direct check: sum_k c_k T_k(L) delta
    delta = np.zeros((g.n_pixels, 1), np.float32)
    delta[ind] = 1.0
    idx, val = g.ellpack(0.75)
    tx = np.asarray(
        spmv.chebyshev_basis(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(delta), K)
    )[:, :, 0]
    for fi in range(Fin):
        for fo in range(Fout):
            expect = np.einsum("k,km->m", coeffs[:, fo, fi], tx)
            np.testing.assert_allclose(maps[fi, fo], expect, atol=1e-5)


def test_evaluate_chebyshev():
    g = build_sphere_graph(4, k=8, method="grid")
    # T_2(x) = 2x^2 - 1 picked out by coeffs [0, 0, 1]
    coeffs = np.zeros((3, 1, 1), np.float32)
    coeffs[2] = 1.0
    bank = SphericalFilterBank(g, coeffs, kind="cheby")
    x = np.linspace(-0.75, 0.75, 7)
    resp = bank.evaluate(x / 0.75)  # evaluate expects rescaled-domain points
    np.testing.assert_allclose(resp[0, 0], 2 * (x / 0.75) ** 2 - 1, atol=1e-6)


def test_filter_plots_smoke(rng):
    g = build_sphere_graph(8, k=8, method="grid")
    coeffs = rng.normal(size=(4, 2, 2)).astype(np.float32)
    bank = SphericalFilterBank(g, coeffs)
    _save(plot_filters_gnomonic(bank, order=4, ind=100), "filters_gnomonic.png")
    _save(plot_filters_section(bank, order=4), "filters_section.png")


# ---------------------------------------------------------------------------
# model plot methods (parity with tests/test_healpy_networks.py:14-88)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def built_model():
    nside = 8
    npix = hp.nside2npix(nside)
    model = ds.HealpyGCNN(
        nside=nside,
        indices=np.arange(npix),
        layers=[
            hp_nn.HealpyChebyshev(K=4, Fout=3, activation="relu"),
            hp_nn.Healpy_ResidualLayer("CHEBY", {"K": 3}, activation="relu"),
            hp_nn.HealpyPool(p=1),
            hp_nn.Flatten(),
            hp_nn.Dense(2),
        ],
    )
    model.build((2, npix, 1))
    return model


def test_model_get_filters(built_model):
    banks = built_model.get_filters(0)
    assert len(banks) == 1 and banks[0].coeffs.shape == (4, 3, 1)
    banks = built_model.get_filters(1)  # residual -> two banks
    assert len(banks) == 2 and banks[0].coeffs.shape == (3, 3, 3)
    weights = built_model.get_filters(0, return_weights=True)
    assert weights[0].shape == (4, 3, 1)
    with pytest.raises(ValueError):
        built_model.get_filters(2)  # pool layer
    # legacy alias
    assert built_model.get_gsp_filters(0)[0].coeffs.shape == (4, 3, 1)


def test_model_plot_methods(built_model):
    import matplotlib.pyplot as plt

    ax = built_model.plot_chebyshev_coeffs(0)
    _save(ax.figure, "model_cheby_coeffs.png")
    ax = built_model.plot_filters_spectral(0)
    _save(ax.figure, "model_filters_spectral.png")
    figs = built_model.plot_filters_section(0)
    _save(figs[0], "model_filters_section.png")
    figs = built_model.plot_filters_gnomonic(0)
    _save(figs[0], "model_filters_gnomonic.png")
