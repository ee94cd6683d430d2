"""extend_indices / transform_indices parity tests (mirroring
``/root/reference/tests/test_utils.py``)."""

import numpy as np

from deepsphere_tpu.sphere import healpix as hp
from deepsphere_tpu.sphere.indexing import (
    check_indices_consistent,
    extend_indices,
    transform_indices,
)


def test_extend_indices_nest():
    nside_in, nside_out = 4, 2
    indices = np.arange(hp.nside2npix(nside_in))[::4]
    new_indices = extend_indices(indices, nside_in=nside_in, nside_out=nside_out)
    # every coarse pixel is touched, so the extension covers the full sphere
    assert len(new_indices) == hp.nside2npix(nside_in)


def test_extend_indices_ring():
    nside_in, nside_out = 4, 2
    m_nest = np.zeros(hp.nside2npix(nside_in))
    m_nest[::4] = 1.0
    m_ring = hp.reorder(m_nest, n2r=True)
    indices = np.arange(hp.nside2npix(nside_in))[m_ring > 0.0]
    new_indices = extend_indices(indices, nside_in=nside_in, nside_out=nside_out, nest=False)
    assert len(new_indices) == hp.nside2npix(nside_in)


def test_extend_indices_partial():
    # a partial patch extends to complete parents only
    nside_in, nside_out = 8, 4
    indices = np.array([0, 5, 17])
    ext = extend_indices(indices, nside_in, nside_out)
    # closed under the 4-child blocks
    assert set(ext.tolist()) == {0, 1, 2, 3, 4, 5, 6, 7, 16, 17, 18, 19}
    assert check_indices_consistent(ext, nside_in, nside_out)
    assert not check_indices_consistent(indices, nside_in, nside_out)


def test_transform_indices_down_up():
    nside = 8
    indices = np.arange(16)  # first 4 coarse pixels at nside/2
    down = transform_indices(nside, 4, indices)
    assert np.all(down == np.arange(4))
    up = transform_indices(4, 8, down)
    assert np.all(up == np.arange(16))
    same = transform_indices(8, 8, indices)
    assert np.all(same == indices)
