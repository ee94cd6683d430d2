"""Gather-free graph convolution: 3x3 stencil on the 12-face HEALPix layout.

This is the TPU-native fast path for the hot loop of the framework — the
K-term polynomial graph convolution that the reference implements as K sparse
matvecs (``/root/reference/src/deepsphere/gnn_layers.py:137-150``).  With the
Laplacian in stencil form (:func:`~deepsphere_tpu.graph.stencil.face_stencil`)
each Laplacian application is nine shifted multiply-adds on dense face images
(pure VPU, no gathers), the face-border halo is refilled between applications
from a precomputed scatter map, and the [K*Fin, Fout] contraction is folded
into the recursion one term at a time so the K-term basis stack is never
materialized in HBM.

The only gathers left are the NEST <-> face layout permutations at the conv
boundary (one each way), and the O(sqrt(M)) halo border fill per step.

The static graph arrays are passed around as a ``tables`` dict (see
:func:`stencil_tables`) so callers can route them through jit as **runtime
arguments** — at nside=1024 the weight planes alone are ~0.5 GB, which must
never be baked into the HLO as constants (it bloats compile time and
overflows the remote-compile transport).

Everything here is plain jnp, so autodiff falls out for free; the fused
Pallas kernel in :mod:`.pallas_stencil` goes further by keeping the recursion
state in VMEM across all K steps.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..graph.stencil import FaceStencil

__all__ = [
    "stencil_tables",
    "pad_faces",
    "edge_strips",
    "extract_edge_bands",
    "stencil_matvec",
    "stencil_graph_conv",
    "stencil_graph_conv_cface",
    "cface_embed",
    "cface_extract",
    "stencil_basis_stack",
]


def _extract_bands(x3, n, h, lane_off=0):
    """The four face-edge bands of the map, cut to depth h in face coords.

    x3: (C, 12, n, W) with face col y at lane ``y + lane_off`` (0 for a
    bare face image, h for the conv's native padded layout).

    On TPU the cut runs as a tiny Pallas DMA kernel producing 8-row /
    128-lane aligned bands: a Pallas custom call pins default layouts, so
    XLA layout assignment cannot propagate the downstream flip/transpose
    layouts into the slices — left to itself it materializes full relayout
    copies of the whole map (3 x ~2.5 ms at nside=1024) just to serve
    them.  The final h-deep cut happens on the small bands.
    """
    import jax

    from .. import config

    W = x3.shape[3]
    rb = min(_round_up_8(h), n)
    # aligned lane windows containing face cols [0, h) and [n-h, n)
    a1 = ((lane_off + n - h) // 128) * 128
    use_pallas = (
        config.pallas_mode() == "compile"
        and rb == 8
        and n >= 128
        and lane_off + h <= 128
        and a1 + 128 <= W
    )
    if use_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        C, F = x3.shape[0], x3.shape[1]

        def kern(x_ref, fr_ref, lr_ref, fc_ref, lc_ref, sem):
            copies = [
                pltpu.make_async_copy(src, dst, sem.at[i])
                for i, (dst, src) in enumerate([
                    (fr_ref, x_ref.at[:, :, 0:rb, :]),
                    (lr_ref, x_ref.at[:, :, n - rb : n, :]),
                    (fc_ref, x_ref.at[:, :, :, 0:128]),
                    (lc_ref, x_ref.at[:, :, :, a1 : a1 + 128]),
                ])
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        fr, lr, fc, lc = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)
            ),
            out_shape=(
                jax.ShapeDtypeStruct((C, F, rb, W), x3.dtype),
                jax.ShapeDtypeStruct((C, F, rb, W), x3.dtype),
                jax.ShapeDtypeStruct((C, F, n, 128), x3.dtype),
                jax.ShapeDtypeStruct((C, F, n, 128), x3.dtype),
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
        )(x3)
        fc_off = lane_off
        lc_off = lane_off + n - h - a1
    else:
        fr = x3[:, :, :rb, :]
        lr = x3[:, :, n - rb :, :]
        fc = x3[:, :, :, lane_off : lane_off + min(128, W - lane_off)]
        lc_w = min(128, lane_off + n)
        lc = x3[:, :, :, lane_off + n - lc_w : lane_off + n]
        fc_off = 0
        lc_off = lc.shape[3] - h
    return (
        fr[:, :, :h, lane_off : lane_off + n],
        lr[:, :, rb - h :, lane_off : lane_off + n],
        fc[:, :, :, fc_off : fc_off + h],
        lc[:, :, :, lc_off : lc_off + h],
    )


def _round_up_8(x):
    return -(-x // 8) * 8


def _src_block(bands, n, h, ax, ay):
    """Slice the (ax, ay) source rectangle of face ``nbf`` out of the
    prefetched edge bands.  A halo-region rectangle always has at least
    one thin (h-wide) axis pinned to a face edge, so it lives inside one
    of the four bands."""
    fr, lr, fc, lc = bands  # (C,12,h,n) first/last rows, (C,12,n,h) cols
    (a0, a1), (b0, b1) = ax, ay
    if a1 - a0 == h and (a0 == 0 or a0 == n - h):
        band = fr if a0 == 0 else lr
        return band if (b1 - b0) == n else band[..., b0:b1]
    band = fc if b0 == 0 else lc
    return band if (a1 - a0) == n else band[:, :, a0:a1, :]


def _edge_block(bands, n, h, f, xs, ys):
    """Halo block for region (xs, ys) of face ``f`` as a structured copy.

    Returns (C, lx, ly) with lx = h if xs else n (same for y), raster-
    ordered by the region's local (xw, yw).  Pure slices + flips + one
    transpose on h-thin bands — no gather (TPU gathers from channels-first
    layouts run far below bandwidth, and per-face thin slices of the full
    map trigger pathological XLA fusions at large nside; hence the band
    prefetch in :func:`edge_strips`).
    """
    from ..sphere.faces import edge_descriptor

    d = edge_descriptor(f, xs, ys)
    lx = h if xs else n
    ly = h if ys else n
    if d is None:  # polar 3-way corner: no pixels
        return jnp.zeros((bands[0].shape[0], lx, ly), bands[0].dtype)
    nbf, fx, fy, swap = d
    xw0 = n - h if xs < 0 else 0
    yw0 = n - h if ys < 0 else 0

    def rng(w0, l, flip):
        return (n - w0 - l, n - w0) if flip else (w0, w0 + l)

    ax = rng(xw0, lx, fx)
    ay = rng(yw0, ly, fy)
    if swap:
        blk = jnp.transpose(_src_block(bands, n, h, ay, ax)[:, nbf], (0, 2, 1))
    else:
        blk = _src_block(bands, n, h, ax, ay)[:, nbf]
    if fx:
        blk = jnp.flip(blk, axis=1)
    if fy:
        blk = jnp.flip(blk, axis=2)
    return blk


def edge_strips(n, h, x3, embedded=False, faces=None, bands=None):
    """The four halo strips of every face, as structured edge copies.

    x3: (C, 12, n, n) channels-first faces — or, with ``embedded=True``,
    (C, 12, n, P_l) in the conv's native padded layout (face col y at
    lane y + h).  Returns ``(west, east, south, north)`` with west/east
    (C, F, h, n+2h) spanning the full padded width (corners included)
    and south/north (C, F, n, h) covering interior rows — the same
    coverage as the gather tables built in :mod:`..graph.stencil` (hmP
    strips), which they replace on the hot path.

    The four face-edge bands are sliced from the full map ONCE (four big
    strided reads); all per-face work then touches only those thin bands.

    For the face-sharded conv, pass ``faces`` (the local face ids) and
    ``bands`` (the all-gathered full-sphere edge bands, as returned by
    :func:`extract_edge_bands`): strips are built for those faces only,
    with neighbor data read from the gathered bands.
    """
    if bands is None:
        bands = _extract_bands(x3, n, h, lane_off=h if embedded else 0)
    if faces is None:
        faces = range(12)

    def row_strip(xs):
        return jnp.stack(
            [
                jnp.concatenate(
                    [
                        _edge_block(bands, n, h, f, xs, -1),
                        _edge_block(bands, n, h, f, xs, 0),
                        _edge_block(bands, n, h, f, xs, 1),
                    ],
                    axis=2,
                )
                for f in faces
            ],
            axis=1,
        )

    def col_strip(ys):
        return jnp.stack(
            [_edge_block(bands, n, h, f, 0, ys) for f in faces], axis=1
        )

    return row_strip(-1), row_strip(1), col_strip(-1), col_strip(1)


def extract_edge_bands(x3, n, h, embedded=False):
    """Public band extraction (see :func:`_extract_bands`) — the
    face-sharded conv all-gathers these (small: O(h·n) per face) to source
    cross-device halo strips."""
    return _extract_bands(x3, n, h, lane_off=h if embedded else 0)


def stencil_tables(st: FaceStencil, bf16_io=False):
    """The device-side arrays of a stencil, as a pytree dict (host numpy;
    convert/donate at the jit boundary).

    ``bf16_io=True`` additionally packs the weight planes re-extended to
    the bf16-I/O kernel's wider R = roundup(h, 16) window margin and cast
    to bf16 (key ``weights_bf16``) — build it ONCE here; the in-graph
    fallback re-reads the f32 planes every conv call."""
    extra = {}
    import numpy as np

    if np.asarray(st.corr_src).shape[0]:
        # corrupt-row mask plane (1 = keep, 0 = corner-corrupt row) in the
        # conv's native (12, n, P_l) lane geometry, built on the HOST: the
        # in-graph per-corner DUS chain it replaces (48+ dynamic-update-
        # slices) pushed big backward programs over an XLA compile
        # threshold that hard-faults the TPU worker (round-5 bisection,
        # tools/probe_qs_train.py: each correction block compiles alone,
        # all three together fault — a complexity cliff, not one bad op)
        from .pallas_stencil import cfp_geometry

        n, h = st.nside, st.n_steps
        _, P_l = cfp_geometry(n, h)
        cm = np.ones((12, n, P_l), np.float32)
        ids = np.asarray(st.corr_out_face, dtype=np.int64)
        f, x, y = ids // (n * n), (ids // n) % n, ids % n
        cm[f, x, y + h] = 0.0
        extra["corr_mask"] = cm

        # flat row indices in the (12*n*P_l) lane geometry, for the
        # ONE-gather / ONE-scatter correction forms the dot-mode backward
        # uses in place of the per-corner patch chains (same XLA
        # complexity cliff)
        def cfp_rows(a):
            a = np.asarray(a, dtype=np.int64)
            fa, xa, ya = a // (n * n), (a // n) % n, a % n
            return ((fa * n + xa) * P_l + ya + h).astype(np.int32)

        extra["corr_src_cfp"] = cfp_rows(st.corr_src)
        extra["corr_rows_cfp"] = cfp_rows(st.corr_out_face)
    if bf16_io:
        from .pallas_stencil import _round_up, cfp_io_available, reextend_weights

        if cfp_io_available(st):
            h = st.n_steps
            extra["weights_bf16"] = np.asarray(
                reextend_weights(st.weights, st.nside,
                                 _round_up(h, 8), _round_up(h, 16))
            ).astype(jnp.bfloat16)
    return {
        **extra,
        "weights": st.weights,
        "west_src": st.west_src,
        "west_mask": st.west_mask,
        "east_src": st.east_src,
        "east_mask": st.east_mask,
        "south_src": st.south_src,
        "south_mask": st.south_mask,
        "north_src": st.north_src,
        "north_mask": st.north_mask,
        "n2f": st.n2f,
        "f2n": st.f2n,
        # corner-correction ball (empty for n_steps == 1)
        "corr_src": st.corr_src,
        "corr_idx": st.corr_idx,
        "corr_val": st.corr_val,
        "corr_out_ball": st.corr_out_ball,
        "corr_out_face": st.corr_out_face,
        # exact-kNN per-application fix rows (empty for grid/ring graphs)
        "fix_src": st.fix_src,
        "fix_idx": st.fix_idx,
        "fix_val": st.fix_val,
    }


def _as_device(tables, st):
    if tables is None:
        tables = stencil_tables(st)
    return {k: jnp.asarray(v) for k, v in tables.items()}


def pad_faces(st: FaceStencil, xf, tables):
    """(12, n, n, C) -> (12, P, P, C) with the cross-face halo filled.

    The halo lands via four static-slice updates (dynamic_update_slice —
    full-bandwidth on TPU); only the thin strips themselves are gathered
    (O(nside) rows).  Index scatters are avoided entirely: TPU serializes
    them.
    """
    n, s = st.nside, st.n_steps
    P = n + 2 * s
    C = xf.shape[-1]
    flat = xf.reshape(12 * n * n, C)

    def strip(name):
        src = tables[f"{name}_src"]
        mask = tables[f"{name}_mask"].astype(xf.dtype)
        return flat[src.reshape(-1)].reshape(src.shape + (C,)) * mask[..., None]

    xpad = jnp.pad(xf, ((0, 0), (s, s), (s, s), (0, 0)))
    xpad = xpad.at[:, :s, :, :].set(strip("west"))
    xpad = xpad.at[:, s + n :, :, :].set(strip("east"))
    xpad = xpad.at[:, s : s + n, :s, :].set(strip("south"))
    xpad = xpad.at[:, s : s + n, s + n :, :].set(strip("north"))
    return xpad


def stencil_matvec(st: FaceStencil, tables, xf):
    """One application of the rescaled Laplacian: y = L~ xf.

    Exact for ``st.n_steps == st.radius`` stencils (one application).

    :param xf: (12, n, n, C) face-layout activations
    :return: (12, n, n, C)
    """
    n, s = st.nside, st.n_steps
    offs = st.offsets
    nc = len(offs) - 1  # center plane index (center is last)
    # weight planes: wrapped-extended layout — interior face rows at [0, n),
    # face col y at lane y + s
    w = tables["weights"][:, :, 0:n, s : s + n].astype(xf.dtype)
    xpad = pad_faces(st, xf, tables)
    y = w[nc][..., None] * xf
    for d, (dx, dy) in enumerate(offs[:-1]):
        sl = xpad[:, s + dx : s + dx + n, s + dy : s + dy + n, :]
        y = y + w[d][..., None] * sl
    fs = tables.get("fix_src")
    if fs is not None and fs.shape[0]:
        # exact-kNN graphs: rows whose edges escape/alias the capture
        # window get the exact ELLPACK matvec (small row set; see
        # graph.stencil.face_stencil)
        C = xf.shape[-1]
        flat = xf.reshape(12 * n * n, C)
        vals = jnp.einsum(
            "rw,rwc->rc",
            tables["fix_val"].astype(xf.dtype),
            flat[tables["fix_idx"]],
            preferred_element_type=jnp.float32,
            precision=config.precision(),
        ).astype(xf.dtype)
        y = y.reshape(12 * n * n, C).at[fs].set(vals).reshape(y.shape)
    return y


def _term_stream(kind, matvec, x0, n_terms):
    """Yield the polynomial basis terms one at a time (never stacked) —
    the shared recursions from :mod:`.spmv`, with the per-step stencil
    matvec as the L application."""
    from .spmv import bernstein_terms, chebyshev_terms, monomial_terms

    if kind == "cheby":
        yield from chebyshev_terms(matvec, x0, n_terms)
    elif kind == "mono":
        yield from monomial_terms(matvec, x0, n_terms)
    elif kind in ("bern", "bern_ref"):
        yield from bernstein_terms(matvec, x0, n_terms,
                                   quirk=kind == "bern_ref")
    else:  # pragma: no cover
        raise ValueError(f"unknown basis kind: {kind}")


def stencil_graph_conv(st: FaceStencil, x, kernel, n_terms, kind, tables=None,
                       layout="nest", fused="auto"):
    """Fused polynomial graph conv on the face layout.

    Drop-in equivalent of ``spmv.graph_conv`` (same kernel layout,
    ``gnn_layers.py:144-150``), keeping the reference's
    (batch, pixel, channel) contract.

    :param x: (B, M, Fin)
    :param kernel: (Fin * n_terms, Fout), Fin-major / term-minor rows
    :param tables: device arrays from :func:`stencil_tables`; pass them
        through the jit boundary as arguments.  ``None`` converts on the
        spot (fine outside jit / in tests only).
    :param layout: ordering of the pixel axis — "nest" (reference contract;
        converted at entry/exit via dense Morton transposes) or "face"
        (face-flat [f, x, y]; zero-permutation hot path — the native mode
        the model assembler uses internally)
    :return: (B, M, Fout)
    """
    B, M, Fin = x.shape
    n = st.nside
    if M != 12 * n * n:
        raise ValueError(f"stencil conv needs the full sphere ({12*n*n} pixels), got {M}")
    r = getattr(st, "radius", 1) or 1
    if (fused != "never" and n_terms > 2 and r >= 3 and st.n_steps == r
            and lap_chain_available(st, kind, n_terms)):
        # deep-radius graphs (k=40/60) on a SHALLOW stencil: chain
        # single-lap fused kernels instead of per-step XLA slices (the
        # one-shot deep-window fused form is measured slower at r >= 3)
        return lap_chain_conv(st, x, kernel, n_terms, kind, tables=tables,
                              layout=layout)
    Fout = kernel.shape[-1]
    tables = _as_device(tables, st)

    x2d = jnp.transpose(x, (1, 0, 2)).reshape(M, B * Fin)
    if layout == "nest":
        from .layout import nest_to_face

        x2d = nest_to_face(x2d)
    elif layout != "face":
        raise ValueError(f"unknown layout: {layout}")

    mode = config.pallas_mode()
    use_fused = False
    if fused != "never" and mode is not None:
        from .pallas_stencil import fused_available

        use_fused = fused_available(st, kind, n_terms,
                                    unroll=B * Fin * Fout * n_terms)

    if use_fused:
        from .pallas_stencil import fused_stencil_conv

        y2d = fused_stencil_conv(
            st, tables, x2d, kernel, n_terms, kind, B,
            interpret=(mode == "interpret"),
        )
        y = y2d.reshape(M, B, Fout)
    else:
        xf = x2d.reshape(12, n, n, B * Fin)
        matvec = lambda t: stencil_matvec(st, tables, t)
        wk = kernel.reshape(Fin, n_terms, Fout)
        y = jnp.zeros((M, B, Fout), dtype=jnp.float32)
        for k, t in enumerate(_term_stream(kind, matvec, xf, n_terms)):
            tk = t.reshape(M, B, Fin)
            y = y + jnp.einsum(
                "mbf,fo->mbo", tk, wk[:, k, :].astype(t.dtype),
                preferred_element_type=jnp.float32, precision=config.precision(),
            )
    if layout == "nest":
        from .layout import face_to_nest

        y = face_to_nest(y.reshape(M, B * Fout)).reshape(M, B, Fout)
    return jnp.transpose(y, (1, 0, 2)).astype(x.dtype)


def lap_chain_available(st: FaceStencil, kind, n_terms):
    """Whether :func:`lap_chain_conv` runs here: a pallas backend, a
    Chebyshev/monomial recurrence, and a SHALLOW stencil (n_steps == the
    template radius) that fits the fused kernel's structural gates for a
    single application."""
    from .pallas_stencil import fused_available

    if st is None or kind not in ("cheby", "mono") or n_terms < 2:
        return False
    r = getattr(st, "radius", 1) or 1
    if st.n_steps != r:
        return False
    return fused_available(st, "mono", 2)


def lap_chain_conv(st: FaceStencil, x, kernel, n_terms, kind, tables=None,
                   layout="nest"):
    """Deep-radius polynomial conv as a CHAIN of single-lap fused kernels.

    The one-shot fused kernel is the wrong trade at radius >= 3: its deep
    window (h = r*(K-1), rounded to the sublane tile) forces (2r+1)^2 tap
    planes plus per-lap roll temporaries to stay live across the K-1
    unrolled laps, shrinking the band until the fused form measures ~2.7x
    slower than the per-step XLA stencil (PERFORMANCE.md round 4).  This
    path instead runs ONE L~ application per fused launch — a SHALLOW
    stencil with ``n_steps == radius`` (h = 3 or 4 instead of 16), a
    monomial term-selector channel kernel (y = 0*x + I*(L x) == L x), the
    existing halo strips / window assembly / corner-ball corrections and
    custom VJP all reused per application — while the Chebyshev/monomial
    recurrence and the channel contraction run at the XLA level between
    launches.  Reference semantics: the per-step recursion of
    ``gnn_layers.py:137-150`` (same math, TPU-shaped execution).

    Same contract as :func:`stencil_graph_conv` (x: (B, M, Fin) ->
    (B, M, Fout)); requires :func:`lap_chain_available`.
    """
    from .pallas_stencil import fused_stencil_conv_cfp
    from .spmv import chebyshev_terms, monomial_terms

    B, M, Fin = x.shape
    n, h = st.nside, st.n_steps
    if M != 12 * n * n:
        raise ValueError(
            f"stencil conv needs the full sphere ({12*n*n} pixels), got {M}")
    Fout = kernel.shape[-1]
    tables = _as_device(tables, st)
    interpret = config.pallas_mode() == "interpret"

    if layout == "nest":
        from .layout import nest_to_face

        x2d = jnp.transpose(x, (1, 0, 2)).reshape(M, B * Fin)
        x2d = nest_to_face(x2d)
        xb = jnp.transpose(x2d.reshape(M, B, Fin), (1, 0, 2))
    elif layout == "face":
        xb = x
    else:
        raise ValueError(f"unknown layout: {layout}")

    # (B, M, Fin) -> (B*Fin, 12, n, P_l) once for the whole chain
    xc = cface_embed(xb, n, h).reshape(B * Fin, 12, n, -1)

    # term-selector kernel: monomial n_terms=2 with rows (Fin-major,
    # term-minor) [0; I] computes y[fo] = sum_fi I[fi,fo] * (L x)[fi]
    sel = jnp.stack(
        [jnp.zeros((Fin, Fin), jnp.float32), jnp.eye(Fin, dtype=jnp.float32)],
        axis=1,
    ).reshape(Fin * 2, Fin)

    def matvec(t):
        return fused_stencil_conv_cfp(st, tables, t, sel, 2, "mono", B,
                                      interpret=interpret)

    terms = (chebyshev_terms if kind == "cheby" else monomial_terms)(
        matvec, xc, n_terms)
    wk = kernel.reshape(Fin, n_terms, Fout)
    y = None
    for k, t in enumerate(terms):
        ti = t[:, :, :, h : h + n].reshape(B, Fin, M)
        yk = jnp.einsum(
            "bfm,fo->bmo", ti, wk[:, k, :],
            preferred_element_type=jnp.float32, precision=config.precision(),
        )
        y = yk if y is None else y + yk

    if layout == "nest":
        from .layout import face_to_nest

        y = face_to_nest(
            jnp.transpose(y, (1, 0, 2)).reshape(M, B * Fout)
        ).reshape(M, B, Fout)
        y = jnp.transpose(y, (1, 0, 2))
    return y.astype(x.dtype)


def stencil_graph_conv_cface(st: FaceStencil, x5, kernel, n_terms, kind,
                             tables=None):
    """Polynomial graph conv in the channels-first padded layout.

    The model assembler's zero-permutation hot path: input and output are
    (B, F, 12, n, P_l) with face col y at lane ``y + h`` (see
    :func:`..ops.pallas_stencil.fused_stencil_conv_cfp`).  On TPU this runs
    the fused Pallas kernel directly on the native layout (no transposes,
    no halo materialization); elsewhere it falls back to the per-step XLA
    face path via an interior slice, so layout plans stay
    platform-independent.

    :param x5: (B, Fin, 12, n, P_l); only interior lanes are read
    :return: (B, Fout, 12, n, P_l); non-interior lanes are garbage
    """
    from .pallas_stencil import cfp_geometry, fused_available

    B, Fin, _, n, P_l = x5.shape
    h = st.n_steps
    R, P_exp = cfp_geometry(n, h)
    if n != st.nside or P_l != P_exp:
        raise ValueError(
            f"cface input geometry {(n, P_l)} does not match the stencil "
            f"({st.nside}, {P_exp})"
        )
    Fout = kernel.shape[-1]
    tables = _as_device(tables, st)
    mode = config.pallas_mode()

    if fused_available(st, kind, n_terms, unroll=B * Fin * Fout * n_terms):
        from .pallas_stencil import fused_stencil_conv_cfp

        y = fused_stencil_conv_cfp(
            st, tables, x5.reshape(B * Fin, 12, n, P_l), kernel, n_terms,
            kind, B, interpret=(mode == "interpret"),
        )
        return y.reshape(B, Fout, 12, n, P_l).astype(x5.dtype)

    # platform fallback: interior slice -> per-step XLA face path -> re-pad
    M = 12 * n * n
    xi = x5[:, :, :, :, h : h + n]  # (B, Fin, 12, n, n)
    xf = jnp.transpose(xi.reshape(B, Fin, M), (0, 2, 1))  # (B, M, Fin)
    yf = stencil_graph_conv(
        st, xf, kernel, n_terms, kind, tables=tables, layout="face",
        fused="never",
    )
    yi = jnp.transpose(yf, (0, 2, 1)).reshape(B, Fout, 12, n, n)
    return jnp.concatenate(
        [
            jnp.zeros((B, Fout, 12, n, h), yi.dtype),
            yi,
            jnp.zeros((B, Fout, 12, n, P_l - n - h), yi.dtype),
        ],
        axis=4,
    )


def cface_embed(x, n, h):
    """(B, M, F) face-flat -> (B, F, 12, n, P_l) channels-first padded."""
    from .pallas_stencil import cfp_geometry

    B, M, F = x.shape
    _, P_l = cfp_geometry(n, h)
    xi = jnp.transpose(x, (0, 2, 1)).reshape(B, F, 12, n, n)
    return jnp.concatenate(
        [
            jnp.zeros((B, F, 12, n, h), x.dtype),
            xi,
            jnp.zeros((B, F, 12, n, P_l - n - h), x.dtype),
        ],
        axis=4,
    )


def cface_extract(x5, h):
    """(B, F, 12, n, P_l) channels-first padded -> (B, M, F) face-flat."""
    B, F, _, n, _ = x5.shape
    xi = x5[:, :, :, :, h : h + n].reshape(B, F, 12 * n * n)
    return jnp.transpose(xi, (0, 2, 1))


def stencil_basis_stack(st: FaceStencil, kind, x2d, n_terms, tables=None):
    """Basis stack in NEST order, shape (n_terms, M, C) — the stencil-path
    analogue of ``spmv.chebyshev_basis`` & co., for tests and parity checks."""
    from .layout import face_to_nest, nest_to_face

    n = st.nside
    M, C = x2d.shape
    tables = _as_device(tables, st)
    xf = nest_to_face(x2d).reshape(12, n, n, C)
    matvec = lambda t: stencil_matvec(st, tables, t)
    terms = [
        face_to_nest(t.reshape(M, C))
        for t in _term_stream(kind, matvec, xf, n_terms)
    ]
    return jnp.stack(terms, axis=0)
