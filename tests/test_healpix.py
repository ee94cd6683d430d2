"""HEALPix geometry core tests (pure numpy, no healpy).

Strategy mirrors the reference's golden-value tests vs healpy
(``/root/reference/tests/test_utils.py``, ``test_healpy_layers.py:21-37``)
but uses internal cross-consistency (NEST path vs RING path, analytic
invariants) since healpy is intentionally not a dependency.
"""

import numpy as np
import pytest

from deepsphere_tpu.sphere import healpix as hp


@pytest.mark.parametrize("nside", [1, 2, 4, 16])
def test_ring_nest_roundtrip(nside):
    npix = hp.nside2npix(nside)
    p = np.arange(npix)
    r = hp.nest2ring(nside, p)
    assert sorted(r.tolist()) == list(range(npix))
    assert np.all(hp.ring2nest(nside, r) == p)


@pytest.mark.parametrize("nside", [1, 2, 8])
def test_pix2ang_consistency(nside):
    npix = hp.nside2npix(nside)
    p = np.arange(npix)
    tn, pn = hp.pix2ang(nside, p, nest=True)
    tr, pr = hp.pix2ang(nside, hp.nest2ring(nside, p), nest=False)
    assert np.allclose(tn, tr)
    assert np.allclose(pn, pr)
    # ring ordering is north-to-south
    z = np.cos(hp.pix2ang(nside, p, nest=False)[0])
    assert np.all(np.diff(z) < 1e-9)
    # angles in range; lonlat convention
    lon, lat = hp.pix2ang(nside, p, nest=True, lonlat=True)
    assert lon.min() >= 0 and lon.max() <= 360
    assert lat.min() >= -90 and lat.max() <= 90


@pytest.mark.parametrize("nside", [2, 8, 32])
def test_ang2pix_roundtrip(nside):
    npix = hp.nside2npix(nside)
    p = np.arange(npix)
    for nest in (True, False):
        t, ph = hp.pix2ang(nside, p, nest=nest)
        assert np.all(hp.ang2pix(nside, t, ph, nest=nest) == p)


def test_pix2vec_unit_norm():
    v = hp.pix2vec(8, np.arange(hp.nside2npix(8)), nest=True)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0)


@pytest.mark.parametrize("nside", [2, 4, 16])
def test_neighbors_nest(nside):
    npix = hp.nside2npix(nside)
    p = np.arange(npix)
    nb = hp.neighbors_nest(nside, p)
    counts = (nb >= 0).sum(axis=1)
    # 24 pixels (3 per three-face corner vertex) have 7 neighbors
    assert np.all((counts == 7) | (counts == 8))
    assert (counts == 7).sum() == 24
    # symmetry
    for i in range(0, npix, max(1, npix // 64)):
        for j in nb[i]:
            if j >= 0:
                assert i in nb[j]
    # geometric sanity: neighbors are close
    v = hp.pix2vec(nside, p, nest=True)
    for d in range(8):
        m = nb[:, d] >= 0
        dist = np.linalg.norm(v[m] - v[nb[m, d]], axis=1)
        assert dist.max() < 4 * hp.nside2resol(nside)


def test_ud_grade_nest_is_block_mean_and_repeat(rng):
    nside = 8
    m = rng.normal(size=hp.nside2npix(nside))
    down = hp.ud_grade(m, 4, order_in="NEST")
    assert np.allclose(down, m.reshape(-1, 4).mean(axis=1))
    up = hp.ud_grade(down, 8, order_in="NEST")
    assert np.allclose(up, np.repeat(down, 4))


def test_ud_grade_ring_matches_nest(rng):
    nside = 8
    m = rng.normal(size=hp.nside2npix(nside))
    d_nest = hp.ud_grade(m, 4, order_in="NEST")
    mr = hp.reorder(m, n2r=True)
    d_ring = hp.ud_grade(mr, 4, order_in="RING")
    assert np.allclose(hp.reorder(d_ring, r2n=True), d_nest)


def test_isnsideok_and_bookkeeping():
    assert hp.isnsideok(16, nest=True)
    assert not hp.isnsideok(12, nest=True)
    assert hp.npix2nside(hp.nside2npix(64)) == 64
    with pytest.raises(ValueError):
        hp.npix2nside(100)
    assert hp.nside2order(1024) == 10
