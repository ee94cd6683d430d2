"""Fused Pallas TPU kernel: the full K-term polynomial stencil conv.

The XLA stencil path (:mod:`.stencil`) materializes every Laplacian
application in HBM (K round trips of the activation).  This kernel keeps the
whole Chebyshev / monomial recursion in VMEM: the grid tiles each face into
(T, T) output tiles; each grid step DMA-copies one (T + 2h, T + 2h) input
window (h = K-1 redundant-compute halo) and the matching per-pixel weight
window, runs all K-1 Laplacian applications on-chip with shrinking validity,
and accumulates the [K*Fin, Fout] contraction into the output tile as each
term is produced.  HBM traffic drops from ~K round trips to ~1.1 reads +
1 write of the activation.

Channel packing: the activation window is held as (S, S*C) so the channel
axis rides the TPU lane dimension together with a spatial axis — at small
C = batch*Fin this is the difference between 1/8th and full VPU utilization.

The rectangular face extension is geometrically incomplete at the 8 polar
3-way corners (see :mod:`..graph.stencil`), so a constant number of rows
near those corners computes garbage under fused multi-step recursion; they
are re-computed exactly afterwards from a precomputed O(100)-row "ball"
ELLPACK and patched in (forward AND both backward passes), keeping the
kernel bit-consistent with the per-step XLA path.

A custom VJP makes the backward pass reuse the same kernel: the rescaled
Laplacian is symmetric, so dx runs the identical recursion on the
incoming cotangent with the transposed channel kernel, and dW accumulates
per-term (C x C') tile contractions in a second small kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..graph.stencil import STENCIL_OFFSETS, FaceStencil

__all__ = ["fused_stencil_conv", "fused_available"]

_OFFS8 = STENCIL_OFFSETS[:8]

# lane-chunk width for the in-kernel fori loop (tunable)
LANE_CHUNK = 128


def fused_available(st: FaceStencil, kind, n_terms):
    """Whether the fused kernel supports this configuration."""
    if config.pallas_mode() is None:
        return False
    if kind not in ("cheby", "mono"):
        return False
    n_steps = n_terms - 1
    if n_steps < 1:
        return False
    return st.n_steps == n_steps


def _round_up(x, m):
    return -(-x // m) * m


def _pick_band(n, h, C, cout):
    """Row-band height: bands slice only the sublane dim (DMA lane slices
    must be 128-aligned on TPU, so windows span the full padded width)."""
    budget = 16 * 2**20
    rh = _round_up(2 * h, 8)
    P = _round_up(n + 2 * h, 128)
    Tr = min(n, 128)
    while Tr > 8 and 3 * C * (Tr + rh) * P * 4 > budget:
        Tr //= 2
    return max(Tr, min(n, 8))


def _kron_block(kernel, B, Fin, Fout, n_terms):
    """(Fin*n_terms, Fout) -> (n_terms, B*Fin, B*Fout) block-diagonal
    per-term channel matrices, so the in-kernel contraction is a plain 2D
    matmul on the packed C = B*Fin axis."""
    wk = kernel.reshape(Fin, n_terms, Fout)
    eye = jnp.eye(B, dtype=kernel.dtype)
    return jnp.einsum("bc,fko->kbfco", eye, wk).reshape(
        n_terms, B * Fin, B * Fout
    )


def _recursion_steps(kind, K, Sr, Pc, wslice, x0):
    """Generate (term_value, validity_offset) for k = 0..K-1 on one lane
    chunk.

    Values are channels-first (C, rows, lanes); step k's value covers chunk
    rows [k, Sr-k) and chunk lanes [k, Pc-k).  ``wslice(d, k)`` returns the
    matching weight window slice.  All slice shapes are static; the channel
    dim stays major so no lane reshapes appear in the hot loop.
    """
    f32 = jnp.float32
    yield x0, 0
    prev2, prev1 = None, x0
    for k in range(1, K):
        mr = Sr - 2 * k
        ml = Pc - 2 * k
        t = wslice(8, k)[None] * prev1[:, 1 : 1 + mr, 1 : 1 + ml]
        for d, (dx, dy) in enumerate(_OFFS8):
            t = t + wslice(d, k)[None] * prev1[
                :, 1 + dx : 1 + dx + mr, 1 + dy : 1 + dy + ml
            ]
        if kind == "cheby" and k >= 2:
            t = 2.0 * t - prev2[:, 2 : 2 + mr, 2 : 2 + ml]
        yield t, k
        prev2, prev1 = prev1, t


def _center2d(val, k, h, Tr, Wc, C):
    """(C, rows, lanes) step-k chunk value -> (Tr*Wc, C) center block."""
    a = h - k
    ctr = val[:, a : a + Tr, a : a + Wc]
    return jnp.transpose(ctr, (1, 2, 0)).reshape(Tr * Wc, C)


def _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd):
    f = pl.program_id(0)
    i = pl.program_id(1)
    cx = pltpu.make_async_copy(
        xpad_ref.at[f, :, pl.ds(i * Tr, Sd), :], xw_ref, sem_x
    )
    cw = pltpu.make_async_copy(
        wpad_ref.at[:, f, pl.ds(i * Tr, Sd), :], w_ref, sem_w
    )
    cx.start()
    cw.start()
    cx.wait()
    cw.wait()


def _chunk_terms(kind, K, Sr, Pc, xw_ref, w_ref, c0):
    """Load one lane chunk (x window + 9 weight planes) and yield the
    recursion terms.  ``c0`` must be 128-aligned (or a static 0)."""
    f32 = jnp.float32
    x0 = xw_ref[:, :Sr, pl.ds(c0, Pc)].astype(f32)
    w_all = w_ref[:, :Sr, pl.ds(c0, Pc)].astype(f32)  # (9, Sr, Pc)

    def wslice(d, k):
        return w_all[d, k : Sr - k, k : Pc - k]

    return _recursion_steps(kind, K, Sr, Pc, wslice, x0)


def _stencil_kernel(kind, K, Tr, Sr, Sd, P, Wc, n, C, Cout,
                    wk_ref, xpad_ref, wpad_ref, out_ref,
                    xw_ref, w_ref, sem_x, sem_w):
    """One (face, band) output tile: band DMA, then a fori_loop over lane
    chunks, each running the full recursion in registers + the fused
    contraction (fori keeps the Mosaic program small at large nside).

    xpad_ref: (12, C, P_r, P) channels-first in HBM (rows padded to P_r so
    every band DMA is sublane-aligned); wpad_ref: (9, 12, P_r, P) in the
    same coordinates.  xw_ref: (C, Sd, P) scratch; w_ref: (9, Sd, P).
    out_ref: (1, Cout, Tr, n) — channel-first so the lane dim is n (no
    VMEM window padding).
    """
    _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd)
    h = (Sr - Tr) // 2
    f32 = jnp.float32
    Pc = Wc + 2 * h

    def run_chunk(c0):
        acc = jnp.zeros((Tr * Wc, Cout), f32)
        for (t, k), kk in zip(
            _chunk_terms(kind, K, Sr, Pc, xw_ref, w_ref, c0), range(K)
        ):
            acc = acc + jax.lax.dot_general(
                _center2d(t, k, h, Tr, Wc, C), wk_ref[kk],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0, :, :, pl.ds(c0, Wc)] = jnp.transpose(
            acc.reshape(Tr, Wc, Cout), (2, 0, 1)
        ).astype(out_ref.dtype)

    if n <= Wc:
        run_chunk(0)
    else:
        def body(ci, carry):
            run_chunk(pl.multiple_of(ci * Wc, 128))
            return carry

        jax.lax.fori_loop(0, n // Wc, body, 0)


def _grad_kernel(kind, K, Tr, Sr, Sd, P, Wc, n, C, Cout,
                 xpad_ref, wpad_ref, dy_ref, out_ref,
                 xw_ref, w_ref, sem_x, sem_w):
    """Accumulates dWblk[k] = sum_bands center(T_k(x))^T @ dy_band.

    dy_ref: (1, Cout, Tr, n) channel-first block; out_ref: (K, C, Cout),
    shared across the (sequential) TPU grid — initialized on the first
    step.
    """
    _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd)
    h = (Sr - Tr) // 2
    f32 = jnp.float32
    Pc = Wc + 2 * h
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def run_chunk(c0):
        dy = jnp.transpose(
            dy_ref[0, :, :, pl.ds(c0, Wc)].astype(f32), (1, 2, 0)
        ).reshape(Tr * Wc, Cout)
        for (t, k), kk in zip(
            _chunk_terms(kind, K, Sr, Pc, xw_ref, w_ref, c0), range(K)
        ):
            part = jax.lax.dot_general(
                _center2d(t, k, h, Tr, Wc, C), dy,
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (C, Cout)
            out_ref[kk] = out_ref[kk] + part.astype(out_ref.dtype)

    if n <= Wc:
        run_chunk(0)
    else:
        def body(ci, carry):
            run_chunk(pl.multiple_of(ci * Wc, 128))
            return carry

        jax.lax.fori_loop(0, n // Wc, body, 0)


def _band_geometry(st, C, cout):
    n = st.nside
    h = st.n_steps
    P = _round_up(n + 2 * h, 128)  # lane-tile aligned padded width
    rh = _round_up(2 * h, 8)
    Tr = _pick_band(n, h, C, cout)
    Sr = Tr + 2 * h
    Sd = Tr + rh
    Wc = min(n, LANE_CHUNK)  # lane chunk: keeps the register working set small
    return n, h, P, rh, Tr, Sr, Sd, Wc


def _run_stencil_kernel(st, kind, n_terms, xpad, wpad, wkb, interpret):
    """pallas_call plumbing for the forward/dx kernel.

    xpad: (12, C, P_r, P) channels-first, rows padded; wpad: (9, 12, P_r, P)
    in xpad coordinates; wkb: (K, C, Cout).  Returns (12, Cout, n, n) f32.
    """
    C = xpad.shape[1]
    Cout = wkb.shape[-1]
    K = n_terms
    n, h, P, rh, Tr, Sr, Sd, Wc = _band_geometry(st, C, Cout)

    kernel = partial(_stencil_kernel, kind, K, Tr, Sr, Sd, P, Wc, n, C, Cout)
    return pl.pallas_call(
        kernel,
        grid=(12, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wkb, whole
            pl.BlockSpec(memory_space=pltpu.ANY),  # xpad — bands DMA'd
            pl.BlockSpec(memory_space=pltpu.ANY),  # wpad — bands DMA'd
        ],
        out_specs=pl.BlockSpec(
            (1, Cout, Tr, n), lambda f, i: (f, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((12, Cout, n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, Sd, P), jnp.float32),
            pltpu.VMEM((9, Sd, P), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(wkb, xpad, wpad)


def _run_grad_kernel(st, kind, n_terms, xpad, wpad, dyf, interpret):
    """dWblk (K, C, Cout) = per-term contractions of the basis of x with dy.

    dyf: (12, Cout, n, n) channel-first.
    """
    C = xpad.shape[1]
    Cout = dyf.shape[1]
    K = n_terms
    n, h, P, rh, Tr, Sr, Sd, Wc = _band_geometry(st, C, Cout)

    kernel = partial(_grad_kernel, kind, K, Tr, Sr, Sd, P, Wc, n, C, Cout)
    return pl.pallas_call(
        kernel,
        grid=(12, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xpad
            pl.BlockSpec(memory_space=pltpu.ANY),  # wpad
            pl.BlockSpec(
                (1, Cout, Tr, n), lambda f, i: (f, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (K, C, Cout), lambda f, i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, C, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, Sd, P), jnp.float32),
            pltpu.VMEM((9, Sd, P), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xpad, wpad, dyf)


# ---------------------------------------------------------------------------
# corner correction: exact recompute of the O(1) rows the rectangular face
# extension cannot represent
# ---------------------------------------------------------------------------


def _ball_spmv(idx, val, t):
    W = idx.shape[1]
    y = val[:, 0:1] * jnp.take(t, idx[:, 0], axis=0)
    for w in range(1, W):
        y = y + val[:, w : w + 1] * jnp.take(t, idx[:, w], axis=0)
    return y


def _corrected_rows(tables, xflat, wkb, n_terms, kind):
    """Exact conv outputs at the corrupt rows via the precomputed ball.

    xflat: (12*n*n, C) face-flat input.  Returns (Rc, Cout).
    """
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    t = xflat[tables["corr_src"]].astype(jnp.float32)  # (Bn, C)
    out_rows = tables["corr_out_ball"]
    hi = jax.lax.Precision.HIGHEST
    acc = jnp.dot(
        t[out_rows], wkb[0], preferred_element_type=jnp.float32, precision=hi
    )
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = _ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        acc = acc + jnp.dot(
            tk[out_rows], wkb[k], preferred_element_type=jnp.float32,
            precision=hi,
        )
        prev2, prev1 = prev1, tk
    return acc


def _basis_at_rows(tables, xflat, n_terms, kind):
    """Exact per-term basis values at the corrupt rows: (K, Rc, C)."""
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    t = xflat[tables["corr_src"]].astype(jnp.float32)
    out_rows = tables["corr_out_ball"]
    terms = [t[out_rows]]
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = _ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        terms.append(tk[out_rows])
        prev2, prev1 = prev1, tk
    return jnp.stack(terms, axis=0)


# ---------------------------------------------------------------------------
# top level with custom VJP
# ---------------------------------------------------------------------------


def _pad_faces_fused(st, tables, xf):
    from .stencil import pad_faces

    return pad_faces(st, xf, tables)


def _forward(st, kind, n_terms, B, interpret, tables, xf2d, kernel):
    """xf2d: (M, C) face-flat (C = B*Fin b-major) -> (M, Cout) face-flat."""
    n = st.nside
    M = 12 * n * n
    C = xf2d.shape[-1]
    Fin = C // B
    Fout = kernel.shape[-1]
    Cout = B * Fout

    wkb = _kron_block(kernel.astype(jnp.float32), B, Fin, Fout, n_terms)
    xf = xf2d.astype(jnp.float32).reshape(12, n, n, C)
    # channels-first for the kernel (spatial dims ride sublanes/lanes), with
    # rows padded so every band DMA is sublane-aligned
    rh = _round_up(2 * st.n_steps, 8)
    P0 = n + 2 * st.n_steps
    P_l = _round_up(P0, 128)
    xpad = jnp.transpose(_pad_faces_fused(st, tables, xf), (0, 3, 1, 2))
    xpad = jnp.pad(
        xpad, ((0, 0), (0, 0), (0, rh - 2 * st.n_steps), (0, P_l - P0))
    )
    wpad = tables["weights"].astype(jnp.float32)  # already (9, 12, P_r, P_l)
    y = _run_stencil_kernel(st, kind, n_terms, xpad, wpad, wkb, interpret)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(M, Cout)
    if tables["corr_src"].shape[0]:
        y_fix = _corrected_rows(tables, xf2d, wkb, n_terms, kind)
        y = y.at[tables["corr_out_face"]].set(y_fix)
    return y


def fused_stencil_conv(st: FaceStencil, tables, xf2d, kernel, n_terms, kind, B,
                       interpret=False):
    """Fused K-term polynomial graph conv on face-flat activations.

    :param st: FaceStencil built with ``n_steps = n_terms - 1``
    :param tables: device arrays (``stencil_tables(st)`` + correction arrays)
    :param xf2d: (M, B*Fin) face-flat activations, batch-major channels
    :param kernel: (Fin*n_terms, Fout)
    :param B: static batch size (the channel packing)
    :return: (M, B*Fout) face-flat, float32
    """

    @partial(jax.custom_vjp, nondiff_argnums=())
    def conv(tables, xf2d, kernel):
        return _forward(st, kind, n_terms, B, interpret, tables, xf2d, kernel)

    def fwd(tables, xf2d, kernel):
        return conv(tables, xf2d, kernel), (tables, xf2d, kernel)

    def bwd(res, dy):
        tables, xf2d, kernel = res
        n = st.nside
        M = 12 * n * n
        C = xf2d.shape[-1]
        Fin = C // B
        Fout = kernel.shape[-1]
        Cout = B * Fout
        dy = dy.astype(jnp.float32)

        # dx: L~ is symmetric, so dx = sum_k T_k(L~) dy W_k^T — the same
        # fused kernel with the transposed channel kernel
        kernel_t = (
            kernel.reshape(Fin, n_terms, Fout)
            .transpose(2, 1, 0)
            .reshape(Fout * n_terms, Fin)
        )
        dx = _forward(st, kind, n_terms, B, interpret, tables, dy, kernel_t)
        dx = dx.astype(xf2d.dtype)

        # dW: per-term tile contractions; corrupt rows contribute through
        # the exact ball basis instead of the kernel's garbage values
        wpad = tables["weights"].astype(jnp.float32)
        xf = xf2d.astype(jnp.float32).reshape(12, n, n, C)
        rh = _round_up(2 * st.n_steps, 8)
        P0 = n + 2 * st.n_steps
        P_l = _round_up(P0, 128)
        xpad = jnp.transpose(_pad_faces_fused(st, tables, xf), (0, 3, 1, 2))
        xpad = jnp.pad(
            xpad, ((0, 0), (0, 0), (0, rh - 2 * st.n_steps), (0, P_l - P0))
        )
        has_corr = bool(tables["corr_src"].shape[0])
        dy_clean = (
            dy.at[tables["corr_out_face"]].set(0.0) if has_corr else dy
        )
        dyf = jnp.transpose(dy_clean.reshape(12, n, n, Cout), (0, 3, 1, 2))
        dwblk = _run_grad_kernel(
            st, kind, n_terms, xpad, wpad, dyf, interpret,
        )  # (K, C, Cout)
        if has_corr:
            basis = _basis_at_rows(tables, xf2d, n_terms, kind)  # (K, Rc, C)
            dy_rc = dy[tables["corr_out_face"]]  # (Rc, Cout)
            dwblk = dwblk + jnp.einsum(
                "krc,ro->kco", basis, dy_rc,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        # fold the block-diagonal structure back to (Fin*K, Fout)
        dwk = jnp.einsum(
            "kbfbo->kfo", dwblk.reshape(n_terms, B, Fin, B, Fout)
        )
        dkernel = jnp.transpose(dwk, (1, 0, 2)).reshape(
            Fin * n_terms, Fout
        ).astype(kernel.dtype)

        dtables = jax.tree_util.tree_map(jnp.zeros_like, tables)
        return (dtables, dx, dkernel)

    conv.defvjp(fwd, bwd)
    return conv(tables, xf2d, kernel)
