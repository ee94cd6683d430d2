"""Gaussian smoothing layer on (possibly partial) HEALPix maps.

TPU-native re-design of ``HealpySmoothing``
(``/root/reference/src/deepsphere/healpy_layers.py:510-853``): the Gaussian
kernel is precomputed host-side as a fixed-width row-normalized ELLPACK
operator (BallTree haversine kNN within ``n_sigma_support * sigma``), and the
smoothing is a padded-gather SpMV on TPU — one fixed-width weighted sum per
pixel, applied per channel with the repetition trick for multi-scale channels
(Gaussian closure under convolution, ``healpy_layers.py:592-621``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .._logger import logger
from ..ops.spmv import ellpack_spmv
from ..sphere import healpix as hp

__all__ = ["SmoothingOperator", "HealpySmoothing"]


def _rad_to_arcmin(theta):
    return theta / np.pi * (180 * 60)


def _arcmin_to_rad(theta):
    return theta * np.pi / (60 * 180)


def _template_ellpack(nside, sig, r, n_sigma_support, indices=None):
    """Row-normalized ELLPACK of ONE narrow-template repetition of the
    stencil decomposition.  ``indices``: observed-pixel set (None = full
    sphere); edges to out-of-mask pixels are dropped and out-of-mask rows
    zeroed, mirroring the reference's masked smoothing.

    Delegates to the native core when available (one C++ pass; the numpy
    body below is the portable fallback and the test oracle — 80 full-map
    passes, ~25 min at nside=1024)."""
    from .. import native

    if native.available():
        return native.gauss_template(nside, r, sig, n_sigma_support, indices)
    return _template_ellpack_numpy(nside, sig, r, n_sigma_support, indices)


def _template_ellpack_numpy(nside, sig, r, n_sigma_support, indices=None):
    from ..sphere.faces import face2nest_index, halo_map

    npix = hp.nside2npix(nside)
    if indices is None:
        indices = np.arange(npix)
    hm = halo_map(nside, r)
    offsets = [(dx, dy)
               for dx in range(-r, r + 1) for dy in range(-r, r + 1)
               if (dx, dy) != (0, 0)]
    T = len(offsets)
    nb_face = np.empty((npix, T), dtype=np.int64)
    for t, (dx, dy) in enumerate(offsets):
        nb_face[:, t] = hm[:, r + dx : r + dx + nside,
                           r + dy : r + dy + nside].reshape(-1)
    f2n = face2nest_index(nside)
    nb = nb_face[f2n]  # NEST order

    in_mask = np.zeros(npix, dtype=bool)
    in_mask[indices] = True
    valid = (nb >= 0) & in_mask[np.clip(nb, 0, npix - 1)]
    valid &= in_mask[:, None]  # zero rows outside the mask

    vec = hp.pix2vec(nside, np.arange(npix), nest=True)
    w = np.zeros((npix, T), dtype=np.float64)
    for t in range(T):
        cj = np.clip(nb[:, t], 0, npix - 1)
        chord2 = np.einsum("ij,ij->i", vec - vec[cj], vec - vec[cj])
        ang = 2.0 * np.arcsin(np.sqrt(np.clip(chord2, 0, 4)) / 2.0)
        wt = np.exp(-0.5 * (ang / sig) ** 2)
        # reference truncation: keep support within n_sigma * sigma
        wt = np.where(ang <= n_sigma_support * sig, wt, 0.0)
        w[:, t] = np.where(valid[:, t], wt, 0.0)

    # center tap (distance 0) + row normalization
    own = np.arange(npix, dtype=np.int64)
    center = in_mask.astype(np.float64)
    rowsum = w.sum(axis=1) + center
    rowsum[rowsum == 0.0] = 1.0
    ell_idx = np.concatenate(
        [np.where(valid, nb, own[:, None]), own[:, None]], axis=1
    ).astype(np.int32)
    ell_val = (
        np.concatenate([w, center[:, None]], axis=1) / rowsum[:, None]
    ).astype(np.float64)
    return ell_idx, ell_val


def _stencil_decomposition(sigma_rad, spacing, n_sigma_support):
    """(m, per-rep sigma, template radius) of the stencil decomposition:
    m repetitions of a sigma/sqrt(m) Gaussian whose n_sigma support fits a
    radius-<=4 face-grid ring template (Gaussian closure, the reference's
    own multi-scale trick at healpy_layers.py:592-621)."""
    r_max = 4
    m = max(1, int(np.ceil(
        (n_sigma_support * sigma_rad / (r_max * spacing)) ** 2
    )))
    sig = sigma_rad / np.sqrt(m)
    r = min(r_max, max(1, int(np.ceil(n_sigma_support * sig / spacing))))
    return m, sig, r


def estimate_stencil_error(sigma_rad, nside, n_sigma_support=3,
                           nside_proxy=16, seed=0):
    """Predicted relative L2 deviation of the stencil decomposition from
    the reference BallTree kernel for a (sigma, nside) configuration.

    Measured at a small proxy nside with the SAME sigma / pixel-spacing
    ratio: the decomposition error is scale-free to within measurement
    noise (error grid in ``tests/test_smoothing_fused.py``:
    1.4-1.8% at 2 px, 2.6-3.2% at 4 px across nside 16/32), because both
    the per-rep truncation and the m-fold composition are functions of
    the ratio only.  Numpy-only — safe to call at model-construction time
    (no accelerator compile).

    FULL-SKY estimate: the proxy operator is built over the whole sphere.
    Masked (partial-sky) operators accumulate extra boundary error — m
    repeated masked-template applications touch the mask edge m times
    where the exact wide kernel touches it once — so for partial-sky
    configurations this bound can under-predict near the boundary (the
    interior, > m*r pixels from the edge, is unaffected).  See
    ``tests/test_smoothing_fused.py::test_stencil_error_bound_masked``."""
    spacing_t = hp.nside2resol(nside)
    spacing_p = hp.nside2resol(nside_proxy)
    sig_p = sigma_rad * spacing_p / spacing_t
    m, sig_each, r = _stencil_decomposition(sig_p, spacing_p,
                                            n_sigma_support)
    npix = hp.nside2npix(nside_proxy)
    idx_t, val_t = _template_ellpack(nside_proxy, sig_each, r,
                                     n_sigma_support)

    # reference-shaped BallTree kernel at the proxy scale
    from sklearn.neighbors import BallTree

    lon, lat = hp.pix2ang(nside_proxy, np.arange(npix), nest=True,
                          lonlat=True)
    theta = np.stack([np.radians(lat), np.radians(lon)], axis=1)
    tree = BallTree(theta, metric="haversine")
    radius = sig_p * n_sigma_support
    kq = int(np.max(tree.query_radius(theta, r=radius, count_only=True)))
    dist, inds = tree.query(theta, k=min(kq, npix), sort_results=True)
    val_b = np.exp(-0.5 / sig_p**2 * dist**2)

    x = np.random.RandomState(seed).normal(size=npix)
    ys = x
    for _ in range(m):
        ys = (val_t * ys[idx_t]).sum(axis=1)
    yb = (val_b * x[inds]).sum(axis=1) / val_b.sum(axis=1)
    return float(np.linalg.norm(ys - yb) / np.linalg.norm(yb))


class SmoothingOperator:
    """Host-side precompute of the sparse Gaussian smoothing kernel.

    Hashable by content key so it can live on a Flax module.  Mirrors the
    constructor logic of the reference layer (fwhm/sigma handling,
    per-channel repetitions inference, disk cache) at
    ``healpy_layers.py:515-664``.

    ``method`` selects the TPU execution form:

    * ``"stencil"`` — the kernel is decomposed into ``m`` repetitions of a
      narrow Gaussian (sigma/sqrt(m); Gaussian closure under convolution —
      the same trick the reference uses for multi-scale channels,
      ``healpy_layers.py:592-621``) whose 3-sigma support fits a
      radius-<=4 face-grid ring template, and each repetition runs as a
      structured stencil matvec — no gathers.  At nside=1024 with
      arcmin-scale sigma the BallTree kernel reaches hundreds of
      neighbors, i.e. hundreds of serialized full-map gathers on TPU;
      this path replaces them with a handful of 81-tap stencils.
    * ``"ellpack"`` — the reference-shaped fixed-width gather SpMV.
    * ``"auto"`` (default) — stencil when the support is wide (> 32
      neighbors) and the template applies, else ellpack.

    The stencil decomposition approximates the BallTree kernel (measured
    rel L2 deviation ~1.4-3.2% for sigma of 1-4 pixel scales, a function
    of sigma/spacing only — see :func:`estimate_stencil_error`).
    ``stencil_rel_tol`` makes ``"auto"`` quantitative: the predicted
    error is computed at construction and the exact ELLPACK kernel is
    kept whenever the prediction exceeds the tolerance (speed *or*
    exactness, chosen by a stated bound instead of silently).
    """

    def __init__(
        self,
        nside,
        indices,
        nest=True,
        fwhm=None,
        sigma=None,
        n_sigma_support=3,
        arcmin=True,
        per_channel_repetitions=None,
        data_path=None,
        method="auto",
        stencil_rel_tol=None,
    ):
        self.method = method
        self.stencil_rel_tol = stencil_rel_tol
        self.stencil = None
        # populated only on the method='auto' + stencil_rel_tol path;
        # None everywhere else (ADVICE r3: callers may read it freely)
        self.stencil_rel_err_est = None
        self.stencil_reps = 1
        self.stencil_apps = 1
        assert fwhm is not None or sigma is not None, "One of fwhm and sigma has to be specified"
        assert fwhm is None or sigma is None, "Only one of fwhm and sigma can be specified"

        self.nside = int(nside)
        self.indices = np.asarray(indices, dtype=np.int64)
        self.nest = nest
        self.n_sigma_support = n_sigma_support
        self.per_channel_repetitions = per_channel_repetitions
        self.data_path = data_path

        self.do_smoothing = not (fwhm == 0.0 or sigma == 0.0)
        if not self.do_smoothing:
            logger.info("The layer implements the identity, smoothing is disabled")
            self._key = ("identity",)
            return

        # multi-scale channels: smallest scale is the base kernel, larger
        # scales are integer repetitions (variances add)
        if isinstance(fwhm, (list, np.ndarray)):
            assert per_channel_repetitions is None
            fwhm = np.asarray(fwhm, dtype=np.float64)
            fwhm_min = float(np.min(fwhm))
            self.per_channel_repetitions = np.ceil((fwhm / fwhm_min) ** 2).astype(int)
            fwhm = fwhm_min
        elif isinstance(sigma, (list, np.ndarray)):
            assert per_channel_repetitions is None
            sigma = np.asarray(sigma, dtype=np.float64)
            sigma_min = float(np.min(sigma))
            self.per_channel_repetitions = np.ceil((sigma / sigma_min) ** 2).astype(int)
            sigma = sigma_min
        elif isinstance(per_channel_repetitions, list):
            self.per_channel_repetitions = np.asarray(per_channel_repetitions, dtype=int)

        if sigma is None:
            sigma = fwhm / np.sqrt(8 * np.log(2))
        if arcmin:
            self.sigma_arcmin = float(sigma)
            self.sigma_rad = _arcmin_to_rad(self.sigma_arcmin)
        else:
            self.sigma_rad = float(sigma)
            self.sigma_arcmin = _rad_to_arcmin(self.sigma_rad)
        self.fwhm_arcmin = self.sigma_arcmin * np.sqrt(8 * np.log(2))

        self.n_indices = len(self.indices)

        if self.method in ("auto", "stencil"):
            # estimated BallTree support: pixel density x kernel disc area
        # (the ellpack path serializes one gather pass per neighbor)
            est_support = (
                3.0 * self.nside**2
                * (self.n_sigma_support * self.sigma_rad) ** 2
            )
            use_stencil = self.method == "stencil" or est_support > 32
            if (use_stencil and self.method == "auto"
                    and stencil_rel_tol is not None):
                # tolerance gate: predict the decomposition's deviation
                # from the BallTree kernel at a small proxy nside (the
                # error is a function of sigma/pixel-spacing only) and
                # keep the exact ELLPACK kernel when it exceeds the ask
                err = estimate_stencil_error(
                    self.sigma_rad, self.nside, self.n_sigma_support
                )
                self.stencil_rel_err_est = err
                if err > stencil_rel_tol:
                    logger.info(
                        f"Stencil decomposition predicted rel L2 error "
                        f"{err:.4f} > stencil_rel_tol={stencil_rel_tol}: "
                        f"using the exact (BallTree/ELLPACK) kernel"
                    )
                    use_stencil = False
                else:
                    logger.info(
                        f"Stencil decomposition predicted rel L2 error "
                        f"{err:.4f} <= stencil_rel_tol={stencil_rel_tol}"
                    )
            if use_stencil:
                self._build_stencil()
        if self.stencil is not None:
            import hashlib

            self._key = (
                "stencil", self.nside, self.n_indices,
                round(self.sigma_arcmin, 10), n_sigma_support,
                self.stencil_reps, self.stencil_apps,
                hashlib.sha1(
                    np.ascontiguousarray(self.indices).tobytes()
                ).hexdigest()[:16],
            )
            logger.info(
                f"Smoothing runs as {self.stencil_reps} repetition(s) of a "
                f"radius-{self.stencil.radius} stencil"
            )
            return

        file_label = f"-nside{self.nside}-sigma{self.sigma_arcmin:4.2f}-n_sigma{n_sigma_support}"

        idx = val = None
        if data_path is not None:
            try:
                idx = np.load(os.path.join(data_path, f"ell_idx{file_label}.npy"))
                val = np.load(os.path.join(data_path, f"ell_val{file_label}.npy"))
                logger.info(f"Loaded cached smoothing kernel from {data_path}")
            except FileNotFoundError:
                idx = val = None
        if idx is None:
            idx, val = self._build_kernel()
            if data_path is not None:
                os.makedirs(data_path, exist_ok=True)
                np.save(os.path.join(data_path, f"ell_idx{file_label}.npy"), idx)
                np.save(os.path.join(data_path, f"ell_val{file_label}.npy"), val)
                logger.info(f"Cached smoothing kernel to {data_path}")

        # row-normalize: smoothing preserves the mean (healpy_layers.py:841-842)
        rowsum = val.sum(axis=1, keepdims=True)
        rowsum[rowsum == 0.0] = 1.0
        self.ell_idx = idx.astype(np.int32)
        self.ell_val = (val / rowsum).astype(np.float32)

        import hashlib

        self._key = (
            self.nside,
            self.n_indices,
            round(self.sigma_arcmin, 10),
            n_sigma_support,
            hashlib.sha1(np.ascontiguousarray(self.indices).tobytes()).hexdigest()[:16],
        )
        logger.info("Successfully created the smoothing kernel operator")

    def _build_stencil(self):
        """Decompose the Gaussian into ``m`` repetitions of a narrow
        template kernel and extract it as a :class:`FaceStencil` —
        smoothing then runs as structured stencil matvecs (no gathers)."""
        from ..graph.stencil import face_stencil
        from ..sphere.faces import face2nest_index, halo_map

        nside = self.nside
        npix = hp.nside2npix(nside)
        spacing = hp.nside2resol(nside)  # radians, mean pixel scale
        m, sig, r = _stencil_decomposition(self.sigma_rad, spacing,
                                           self.n_sigma_support)

        class _EllGraph:
            """Duck-typed graph carrying a prebuilt full-sphere template
            ELLPACK into ``face_stencil`` (the row-normalized smoothing
            matrix is not a Laplacian; scale is ignored)."""

            def __init__(self, nside, k, ell):
                self.nside = nside
                self.k = k
                self.indices = np.arange(12 * nside * nside)
                self.n_pixels = 12 * nside * nside
                self._ell = ell
                # template columns follow the raster tap order (center
                # last): the native plane extractor may copy full-interior
                # rows without the per-entry search
                self._ell_raster_ordered = True

            def ellpack(self, scale):
                return self._ell

        # fused depth: extract the stencil deep enough that ALL m (x
        # per-channel) repetitions run as ONE fused Pallas pass — S^j x is
        # the j-th monomial recursion term, selected by a one-hot
        # contraction (see HealpySmoothing._apply_stencil).  The kernel
        # geometry caps the halo at h = r * n_apps (2h <= 128 lanes,
        # window rows 8-aligned: ops.pallas_stencil.cfp_structural_available);
        # when the full chain does not fit, fall back to one application
        # per pass (n_apps = 1, the per-step XLA path).
        reps_arr = self.per_channel_repetitions
        reps_max = int(np.max(reps_arr)) if reps_arr is not None else 1
        m_total = m * reps_max
        h_fits = lambda j: (
            2 * r * j <= 128 and nside % 8 == 0
            and nside >= -(-r * j // 8) * 8 and r * j < nside
        )
        n_apps = m_total
        while n_apps > 1 and not h_fits(n_apps):
            n_apps -= 1  # chunked fusion: ceil(m_total / n_apps) passes

        # the template build + radius-r extraction is minutes of single-core
        # numpy at nside>=512: disk-cache the extracted stencil, keyed by
        # the full smoothing identity (mirrors the reference's kernel cache,
        # healpy_layers.py:652-662)
        import hashlib

        k_of_r = {1: 8, 2: 20, 3: 40, 4: 60}
        idx_h = hashlib.sha1(
            np.ascontiguousarray(self.indices).tobytes()
        ).hexdigest()[:16]
        stencil_key = (
            "smoothstencil", nside, self.n_indices, idx_h,
            round(self.sigma_arcmin, 10), self.n_sigma_support, m, r,
        )
        g = _EllGraph(nside, k_of_r[r], None)
        g._key = stencil_key
        from ..graph.stencil import load_stencil_cache, save_stencil_cache

        st = load_stencil_cache(g, 0.0, r * n_apps, self.data_path)
        if st is not None:
            logger.info(f"Loaded cached smoothing stencil from {self.data_path}")
            self.stencil = st
            self.stencil_reps = m
            self.stencil_apps = n_apps
            return

        g._ell = _template_ellpack(nside, sig, r, self.n_sigma_support,
                                   self.indices)
        self.stencil = face_stencil(g, 0.0, n_steps=r * n_apps)
        save_stencil_cache(self.stencil, g, self.data_path)
        self.stencil_reps = m
        self.stencil_apps = n_apps

    def _build_kernel(self):
        """BallTree haversine kNN within n_sigma_support * sigma, evaluated
        with the Gaussian kernel (``healpy_layers.py:766-829``)."""
        from sklearn.neighbors import BallTree

        lon, lat = hp.pix2ang(self.nside, self.indices, nest=self.nest, lonlat=True)
        theta = np.stack([np.radians(lat), np.radians(lon)], axis=1)
        tree = BallTree(theta, metric="haversine")

        radius = self.sigma_rad * self.n_sigma_support
        counts = tree.query_radius(theta, r=radius, count_only=True)
        max_neighbors = int(np.max(counts))
        logger.info(f"The maximal number of neighbors within that radius is {max_neighbors}")

        dist, inds = tree.query(theta, k=min(max_neighbors, self.n_indices), sort_results=True)
        val = np.exp(-0.5 / self.sigma_rad**2 * dist**2).astype(np.float32)
        return inds.astype(np.int64), val

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, SmoothingOperator) and self._key == other._key


class HealpySmoothing(nn.Module):
    """Flax smoothing layer; ``operator`` is a precomputed
    :class:`SmoothingOperator`; ``mask`` optionally zeroes the padding region
    (``healpy_layers.py:758-759``)."""

    operator: SmoothingOperator
    mask: Optional[Any] = None

    @nn.compact
    def __call__(self, x, training=False):
        op = self.operator
        if not op.do_smoothing:
            return x
        B, M, C = x.shape
        if M != op.n_indices:
            raise ValueError(f"Input has {M} pixels, operator expects {op.n_indices}")

        reps = op.per_channel_repetitions
        if reps is not None:
            assert len(reps) == C, f"per_channel_repetitions has to have length {C}"

        if op.stencil is not None:
            y = self._apply_stencil(op, x, reps)
        else:
            # kernel arrays ride the "graph_tables" collection: runtime args
            # through jit, never HLO constants (O(M*support) at large nside)
            tables = self.variable(
                "graph_tables", "smoothing",
                lambda: {"idx": op.ell_idx, "val": op.ell_val},
            ).value
            idx = tables["idx"]
            val = tables["val"].astype(x.dtype)
            x2d = jnp.transpose(x, (1, 0, 2))  # (M, B, C)

            if reps is None:
                y2d = ellpack_spmv(
                    idx, val, x2d.reshape(M, B * C)
                ).reshape(M, B, C)
            else:
                chans = []
                for c in range(C):
                    xc = x2d[:, :, c]
                    for _ in range(int(reps[c])):
                        xc = ellpack_spmv(idx, val, xc)
                    chans.append(xc)
                y2d = jnp.stack(chans, axis=2)
            y = jnp.transpose(y2d, (1, 0, 2))
        if self.mask is not None:
            mask = jnp.asarray(self.mask, dtype=x.dtype)
            if mask.ndim == 1:
                mask = mask[None, :, None]
            elif mask.ndim == 2:
                mask = mask[None]
            y = y * mask
        return y

    def _apply_stencil(self, op, x, reps):
        """Structured path: m repetitions of the narrow template stencil in
        face layout (masked rows embedded via take, never scatter).

        When the operator's stencil was extracted at the full chain depth
        (``stencil_apps == m_total``), every channel's power S^{j_c} x is
        ONE graph-conv call: the monomial recursion terms are exactly the
        powers of S, and a one-hot contraction selects term ``j_c`` for
        channel ``c`` — on TPU this is a single fused Pallas pass over the
        map instead of m_total serialized halo-pad matvecs."""
        from ..ops.stencil import stencil_graph_conv, stencil_tables

        st = op.stencil
        n = st.nside
        npix = 12 * n * n
        B, M, C = x.shape

        def _tbl():
            t = stencil_tables(st)
            if M != npix:
                ind = np.asarray(op.indices, dtype=np.int64)
                inv = np.full(npix, M, dtype=np.int32)
                inv[ind] = np.arange(M, dtype=np.int32)
                t["mask_ind"] = ind.astype(np.int32)
                t["mask_inv"] = inv
            return t

        tables = self.variable(
            "graph_tables", "smoothing_stencil", _tbl
        ).value
        x2d = jnp.transpose(x, (1, 0, 2)).reshape(M, B * C)
        if M != npix:
            xpad = jnp.concatenate(
                [x2d, jnp.zeros((1, B * C), x2d.dtype)], axis=0
            )
            x2d = jnp.take(xpad, tables["mask_inv"], axis=0)

        base = int(op.stencil_reps)
        apps = int(getattr(op, "stencil_apps", 1))
        remaining = (base * np.asarray(reps, dtype=int) if reps is not None
                     else np.full(C, base, dtype=int))

        # power chain in ceil(m_total / apps) conv passes: S^j = j-th
        # monomial recursion term; a one-hot contraction picks the power
        # each channel still needs (finished channels ride term 0 = id).
        # n_terms is pinned to apps+1 so every pass matches the stencil's
        # extraction depth and stays on the fused kernel.
        conv_tables = {k: v for k, v in tables.items()
                       if k not in ("mask_ind", "mask_inv")}
        n_terms = apps + 1
        rem0 = remaining.copy()

        def chain(xbmc, conv_tables, fused):
            rem = rem0.copy()
            while rem.max() > 0:
                j = np.minimum(rem, apps)
                wk = np.zeros((C, n_terms, C), np.float32)
                for c in range(C):
                    wk[c, int(j[c]), c] = 1.0
                xbmc = stencil_graph_conv(
                    st, xbmc, jnp.asarray(wk.reshape(C * n_terms, C)),
                    n_terms, "mono", tables=conv_tables, layout="face",
                    fused=fused,
                )
                rem = rem - j
            return xbmc

        # The smoothing operator S is row-normalized, hence NOT symmetric —
        # the fused kernel's custom VJP (built for the symmetric rescaled
        # Laplacian) would silently backpropagate S instead of S^T.  The
        # chain is linear in x, so run the fused kernel forward and take
        # the EXACT gradient as the linear transpose of the per-step XLA
        # chain (whose autodiff is plain jnp and therefore correct).
        @jax.custom_vjp
        def smooth_chain(xbmc, conv_tables):
            return chain(xbmc, conv_tables, "auto")

        def _fwd(xbmc, conv_tables):
            return smooth_chain(xbmc, conv_tables), conv_tables

        def _bwd(conv_tables, dy):
            # the chain maps (B, npix, C) -> (B, npix, C) in the input's
            # dtype, so dy's aval IS the input aval (works for any dtype
            # and under vmap; residuals cannot carry aval/dtype objects)
            tr = jax.linear_transpose(
                lambda v: chain(v, conv_tables, "never"),
                jax.ShapeDtypeStruct(dy.shape, dy.dtype),
            )
            (dx,) = tr(dy)
            return dx, jax.tree_util.tree_map(lambda _: None, conv_tables)

        smooth_chain.defvjp(_fwd, _bwd)

        xface = jnp.take(x2d, tables["n2f"], axis=0)
        xbmc = jnp.transpose(xface.reshape(npix, B, C), (1, 0, 2))
        xbmc = smooth_chain(xbmc, conv_tables)
        y2d = jnp.transpose(xbmc, (1, 0, 2)).reshape(npix, B * C)
        y2d = jnp.take(y2d, tables["f2n"], axis=0)
        if M != npix:
            y2d = jnp.take(y2d, tables["mask_ind"], axis=0)
        return jnp.transpose(y2d.reshape(M, B, C), (1, 0, 2))
