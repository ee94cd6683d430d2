"""Stencil form of the sphere-graph Laplacian on the 12-face HEALPix layout.

The reference computes graph convolution as repeated sparse matvecs of an
M x M Laplacian (``/root/reference/src/deepsphere/gnn_layers.py:137-143``
via ``tf.sparse.sparse_dense_matmul``).  On TPU, gathers are the enemy; but
for the 8-neighbor HEALPix graph the Laplacian *is* a 3x3 stencil on the
(12, nside, nside) face layout (see :mod:`..sphere.faces`), with per-pixel
weights (edge weights vary over the sphere) and a halo exchange at face
borders.  This module extracts that stencil from any grid-structured
:class:`~deepsphere_tpu.graph.SphereGraph`:

* ``weights`` — (9, 12, Pw, Pw) per-direction weight planes of the rescaled
  Laplacian (directions follow the healpix_base neighbor order SW, W, NW, N,
  NE, E, SE, S, plus the diagonal/center term last).
* border fill indices — scatter/gather maps that fill a depth-``n_steps``
  halo around each face from the other faces.
* ``corrupt`` — for fused multi-step application (``n_steps > 1``): the halo
  positions near the 8 polar 3-way corners whose neighborhoods are not
  representable in a rectangular face layout (a constant ~96 positions,
  independent of nside), plus the interior NEST rows whose values they can
  reach within ``n_steps - 1`` hops.  Fused kernels must re-correct those
  rows (see :func:`~deepsphere_tpu.ops.stencil` users); the single-step
  path (``n_steps == 1``) is exact.

Extraction verifies per-row mass conservation against the CSR Laplacian, so
a graph whose edges are not grid-structured (e.g. a kNN graph that deviates
at face corners) is detected and rejected — callers then fall back to the
ELLPACK gather path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..sphere import healpix as hp
from ..sphere.faces import face2nest_index, halo_map
from ..sphere.healpix import _NB_XOFFSET, _NB_YOFFSET

__all__ = ["FaceStencil", "face_stencil", "STENCIL_OFFSETS"]

# (dx, dy) per weight plane; plane 8 is the center/diagonal term
STENCIL_OFFSETS = [(int(x), int(y)) for x, y in zip(_NB_XOFFSET, _NB_YOFFSET)] + [(0, 0)]


@dataclass(eq=False)
class FaceStencil:
    """Static stencil-form Laplacian for ``n_steps`` fused applications."""

    nside: int
    n_steps: int  # halo (pad) depth; weights cover positions of depth <= n_steps-1
    scale: float
    weights: np.ndarray  # (9, 12, Pw, Pw) f32, Pw = nside + 2*(n_steps-1)
    border_pos: np.ndarray  # (Nb,) int32 flat positions in 12*P*P, P = nside+2*n_steps
    border_src: np.ndarray  # (Nb,) int32 face-flat (12*n*n) source rows, clamped
    border_mask: np.ndarray  # (Nb,) f32 — 0 where no pixel exists
    n2f: np.ndarray  # (12*n*n,) int32: NEST id at each face-flat position
    f2n: np.ndarray  # (npix,) int32: face-flat position of each NEST pixel
    corrupt_rows: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    # NEST rows whose fused-kernel outputs need exact recomputation

    @property
    def pad_width(self):
        return self.nside + 2 * self.n_steps

    @property
    def weights_width(self):
        return self.nside + 2 * (self.n_steps - 1)


def _lookup_entries(ell_idx, ell_val, rows, cols, chunk=1 << 20):
    """values[i] = L[rows[i], cols[i]] from a padded ELLPACK matrix."""
    out = np.zeros(rows.shape[0], dtype=ell_val.dtype)
    for s in range(0, rows.shape[0], chunk):
        r = rows[s : s + chunk]
        c = cols[s : s + chunk]
        out[s : s + chunk] = (ell_val[r] * (ell_idx[r] == c[:, None])).sum(axis=1)
    return out


def face_stencil(graph, scale, n_steps=1):
    """Extract the stencil form of ``graph``'s rescaled Laplacian.

    :param graph: a :class:`~deepsphere_tpu.graph.SphereGraph` over the full
        sphere whose edges connect only NEST grid neighbors (k=8 "grid"
        construction).
    :param scale: spectrum rescale passed to ``graph.ellpack``.
    :param n_steps: number of fused stencil applications the caller intends
        (halo depth).  ``1`` (default) is exact; ``>1`` produces a
        ``corrupt_rows`` set that callers must re-correct.
    :raises ValueError: if the graph is not stencil-representable.
    """
    nside = int(graph.nside)
    npix = hp.nside2npix(nside)
    if graph.n_pixels != npix:
        raise ValueError("face stencil requires a full-sphere graph")
    if n_steps < 1 or n_steps >= nside:
        raise ValueError(f"n_steps must be in [1, nside), got {n_steps}")

    ell_idx, ell_val = graph.ellpack(scale)
    if ell_idx.shape[1] > 9:
        raise ValueError(
            f"graph rows have up to {ell_idx.shape[1]} entries; "
            "not an 8-neighbor grid graph"
        )

    h = n_steps - 1  # weight coverage depth
    Pw = nside + 2 * h
    hm = halo_map(nside, h + 1)  # need neighbors of depth-h positions

    # weight planes: w[d, f, u, v] = L[pix(f,u,v), pix((f,u,v)+d)]
    core = hm[:, 1 : 1 + Pw, 1 : 1 + Pw]
    rows_flat = core.reshape(-1)
    weights = np.zeros((9, 12 * Pw * Pw), dtype=np.float32)
    captured_abs = np.zeros(12 * Pw * Pw, dtype=np.float64)
    for d, (dx, dy) in enumerate(STENCIL_OFFSETS):
        nbr = hm[:, 1 + dx : 1 + dx + Pw, 1 + dy : 1 + dy + Pw].reshape(-1)
        valid = (rows_flat >= 0) & (nbr >= 0)
        vals = np.zeros(rows_flat.shape[0], dtype=np.float32)
        vals[valid] = _lookup_entries(ell_idx, ell_val, rows_flat[valid], nbr[valid])
        weights[d] = vals
        captured_abs += np.abs(vals, dtype=np.float64)

    # mass-conservation check against the CSR rescaled Laplacian
    L = graph.rescaled(scale)
    row_abs = np.asarray(np.abs(L).sum(axis=1)).ravel()
    real = rows_flat >= 0
    expect = row_abs[rows_flat[real]]
    got = captured_abs[real]
    tol = 1e-6 * (1.0 + expect)
    if np.any(got > expect + tol):
        raise ValueError("stencil extraction double-counted entries (internal error)")
    incomplete = np.zeros(12 * Pw * Pw, dtype=bool)
    incomplete[real] = got < expect - tol

    # interior rows must be complete, else the graph is not grid-structured
    interior = np.zeros((12, Pw, Pw), dtype=bool)
    interior[:, h : h + nside, h : h + nside] = True
    if np.any(incomplete & interior.reshape(-1)):
        n_bad = int(np.sum(incomplete & interior.reshape(-1)))
        raise ValueError(
            f"{n_bad} graph rows have edges outside the NEST 8-neighbor "
            "structure; graph is not stencil-representable"
        )

    # fused-step corruption: halo positions with incomplete neighborhoods
    # poison everything within graph distance (n_steps - 1)
    corrupt_rows = np.zeros(0, dtype=np.int64)
    if n_steps > 1 and np.any(incomplete):
        seeds = np.unique(rows_flat[incomplete])
        nb = hp.neighbors_nest(nside, np.arange(npix, dtype=np.int64))
        reach = set(seeds.tolist())
        frontier = set(seeds.tolist())
        for _ in range(n_steps - 1):
            nxt = set()
            fr = np.fromiter(frontier, dtype=np.int64)
            for q in np.unique(nb[fr][nb[fr] >= 0]):
                if q not in reach:
                    nxt.add(int(q))
            reach |= nxt
            frontier = nxt
        corrupt_rows = np.fromiter(sorted(reach), dtype=np.int64)

    # border fill maps for a depth-n_steps pad
    P = nside + 2 * n_steps
    hmP = halo_map(nside, n_steps)
    is_border = np.ones((12, P, P), dtype=bool)
    is_border[:, n_steps : n_steps + nside, n_steps : n_steps + nside] = False
    border_pos = np.flatnonzero(is_border.reshape(-1)).astype(np.int32)
    src_pix = hmP.reshape(-1)[border_pos]
    border_mask = (src_pix >= 0).astype(np.float32)
    f2n = face2nest_index(nside)
    border_src = f2n[np.clip(src_pix, 0, npix - 1)].astype(np.int32)

    n2f = halo_map(nside, 0).reshape(-1).astype(np.int32)

    return FaceStencil(
        nside=nside,
        n_steps=n_steps,
        scale=float(scale),
        weights=weights.reshape(9, 12, Pw, Pw),
        border_pos=border_pos,
        border_src=border_src,
        border_mask=border_mask,
        n2f=n2f,
        f2n=f2n.astype(np.int32),
        corrupt_rows=corrupt_rows,
    )
