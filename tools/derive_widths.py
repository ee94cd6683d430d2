"""Derive per-(nside, k) Gaussian kernel widths by harmonic alignment.

The reference pins a pygsp fork whose ``SphereHealpix`` ships empirically
tuned kernel widths (``/root/reference/setup.cfg:20``); the tables are not
retrievable here, so we RE-DERIVE widths with the construction the
DeepSphere paper describes (arXiv:2012.15000 §3: choose the kernel width
that makes graph filtering most equivariant, i.e. the graph Laplacian
spectrum best aligned with spherical harmonics).

Objective: eigenvalues of the normalized graph Laplacian, sorted, should
form flat plateaus of multiplicity (2l+1) — the harmonic multiplets of the
Laplace-Beltrami operator.  We minimize the mean relative within-multiplet
dispersion over l = 1..lmax_fit.  This is evaluated with a dense eigh at
small nside (exact) and a golden-section search over the width, expressed
as a multiple of the mean neighbor distance (the scale-free parameter, so
results transfer across nside by the 1/nside spacing law).

Usage:  python tools/derive_widths.py [k] [nside ...]
Writes its findings to stdout as a python dict literal.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def multiplet_dispersion(L, lmax_fit, sparse_mode=False):
    """Mean relative within-multiplet eigenvalue dispersion over
    l = 1..lmax_fit.

    ``sparse_mode`` computes only the lowest (lmax_fit+1)^2 eigenvalues by
    shift-invert Lanczos — the low multiplets are exactly what the
    objective measures, and it is the only tractable route past
    nside=32 (dense eigh at nside=64 would need a 49152^2 matrix)."""
    n_need = (lmax_fit + 1) ** 2
    if sparse_mode or L.shape[0] > 4096:
        from scipy.sparse.linalg import eigsh

        # sigma slightly below 0: L is PSD with a null constant mode, so
        # sigma=0 would hand the factorization an exactly singular matrix
        lam = np.sort(eigsh(
            L.tocsc(), k=n_need, sigma=-1e-3, which="LM",
            return_eigenvectors=False,
        ))
    else:
        lam = np.linalg.eigvalsh(L.toarray())
    err = 0.0
    pos = 1  # skip the constant mode
    for l in range(1, lmax_fit + 1):
        m = 2 * l + 1
        grp = lam[pos : pos + m]
        pos += m
        mean = grp.mean()
        if mean > 0:
            err += grp.std() / mean
    return err / lmax_fit


def width_error(nside, k, ratio):
    from deepsphere_tpu.graph.laplacian import (
        _grid_adjacency,
        _grid_ring_adjacency,
        _normalized_laplacian,
    )
    from deepsphere_tpu.sphere import healpix as hp

    indices = np.arange(hp.nside2npix(nside))
    if k == 8:
        W, base = _grid_adjacency(nside, indices, None)
        build = lambda w: _grid_adjacency(nside, indices, w)[0]
    else:
        W, base = _grid_ring_adjacency(nside, indices, k, None)
        build = lambda w: _grid_ring_adjacency(nside, indices, k, w)[0]
    L = _normalized_laplacian(build(ratio * base))
    # dense mode fits up to ~3nside/2 multiplets; sparse (shift-invert)
    # mode caps the count so the Lanczos stays tractable at nside >= 64
    lmax_fit = min(3 * nside // 2, 2 * nside - 1)
    if hp.nside2npix(nside) > 4096:
        lmax_fit = min(lmax_fit, int(os.environ.get("DW_LMAX_FIT", 16)))
    return multiplet_dispersion(L, lmax_fit), base


def golden(f, lo, hi, iters=16):
    g = (np.sqrt(5) - 1) / 2
    a, b = lo, hi
    c = b - g * (b - a)
    d = a + g * (b - a)
    fc, fd = f(c), f(d)
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - g * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + g * (b - a)
            fd = f(d)
    return (a + b) / 2


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nsides = [int(a) for a in sys.argv[2:]] or [4, 8, 16]
    out = {}
    for nside in nsides:
        cache = {}

        def f(ratio):
            r = round(float(ratio), 6)
            if r not in cache:
                cache[r] = width_error(nside, k, r)[0]
            return cache[r]

        lo = float(os.environ.get("DW_LO", 0.4))
        hi = float(os.environ.get("DW_HI", 2.5))
        iters = int(os.environ.get("DW_ITERS", 16))
        best = golden(f, lo, hi, iters=iters)
        _, base = width_error(nside, k, best)
        out[nside] = {
            "ratio": round(float(best), 4),
            "width": round(float(best * base), 8),
            "mean_dist": round(float(base), 8),
            "err": round(float(f(best)), 6),
            "err_at_1": round(float(f(1.0)), 6),
        }
        print(f"nside={nside} k={k}: {out[nside]}", flush=True)
    print({"k": k, "table": out})


if __name__ == "__main__":
    main()
