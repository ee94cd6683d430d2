"""Fused Pallas TPU kernel: the full K-term polynomial stencil conv.

The XLA stencil path (:mod:`.stencil`) materializes every Laplacian
application in HBM (K round trips of the activation).  This kernel keeps the
whole Chebyshev / monomial recursion in VMEM: the grid walks row bands of
each face; each grid step DMA-copies one full-width band window (with an
h = K-1 redundant-compute halo) plus the matching per-pixel weight planes,
runs all K-1 Laplacian applications on-chip, and folds the
``[K*Fin, Fout]`` contraction into the recursion term by term.  HBM traffic
drops from ~K round trips to ~1.1 reads + 1 write of the activation.

Layout / scheduling notes (what makes this fast on TPU):

* Activations are channels-first ``(C, rows, lanes)`` with C = batch*Fin:
  both spatial axes ride the VPU's (sublane, lane) register dims at full
  width, and the band is processed whole — every array in the hot loop is
  lane-tile aligned, so no per-chunk halo re-layouts.
* The nine stencil taps use fixed ±1 ``pltpu.roll`` shifts on full-size
  arrays instead of k-dependent (unaligned) shrinking slices.  Border
  wrap-around garbage advances one row/lane per recursion step and never
  reaches the h-offset center that is written out.
* The channel contraction runs on the VPU as scalar-AXPY accumulation
  (kernel coefficients live in SMEM): at the typical C = batch*Fin of this
  workload an MXU matmul would be <2% utilized and needs a massive
  (C, rows, lanes) -> (rows*lanes, C) relayout per term; the AXPY form
  needs neither.  The block structure of the per-batch kernel is exploited
  directly (Fin*Fout*K scalar FMAs, not (B*Fin)*(B*Fout)*K).

The rectangular face extension is geometrically incomplete at the 8 polar
3-way corners (see :mod:`..graph.stencil`), so a constant number of rows
near those corners computes garbage under fused multi-step recursion; they
are re-computed exactly afterwards from a precomputed O(100)-row "ball"
ELLPACK and patched in (forward AND both backward passes), keeping the
kernel bit-consistent with the per-step XLA path.

A custom VJP makes the backward pass reuse the same kernel: the rescaled
Laplacian is symmetric, so dx runs the identical recursion on the
incoming cotangent with the transposed channel kernel, and dW accumulates
per-term scalar contractions in a second kernel over the same bands.
"""

from __future__ import annotations

import os
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
    """Row-band height Tr: the largest power-of-two band whose working set
    (recursion state + weight planes + accumulators + pipeline buffers)
    fits the VMEM budget.  Bands slice only the sublane dim; lanes always
    span the full padded width so everything stays tile-aligned."""
    budget = int(os.environ.get("DS_PALLAS_VMEM_MB", "96")) * 2**20
    rh = _round_up(2 * h, 8)
    P = _round_up(n + 2 * h, 128)
    for Tr in (512, 256, 128, 64, 32, 16, 8):
        if Tr > n or n % Tr:
            continue
        Sr = Tr + 2 * h
        Sd = Tr + rh
        est = 4 * (
            6 * C * Sr * P  # recursion state (prev2/prev1/t) + roll temps
            + (C + 9) * Sd * P  # band scratch (x + weight planes)
            + cout * Tr * P  # AXPY accumulators
            + 2 * cout * Tr * n  # double-buffered output block
        )
        if est <= budget:
            return Tr
    return min(n, 8)


def _band_geometry(st, C, cout):
    n = st.nside
    h = st.n_steps
    P = _round_up(n + 2 * h, 128)  # lane-tile aligned padded width
    rh = _round_up(2 * h, 8)
    Tr = _pick_band(n, h, C, cout)
    Sr = Tr + 2 * h
    Sd = Tr + rh
    return n, h, P, rh, Tr, Sr, Sd


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


def _term_stream(kind, K, Sr, P, w, x0):
    """Yield the K recursion terms on a full-size (C, Sr, P) band window.

    Every term is full-size: the nine taps are fixed ±1 circular shifts
    (``pltpu.roll``), so wrap-around garbage creeps in one row/lane per
    step from the window border.  Validity after step k covers rows/lanes
    [k, Sr-k) / [k, P-k); callers only consume the h-offset center, which
    stays exact for all k <= h = K-1.
    """

    def lap(p):
        qm = pltpu.roll(p, 1, axis=2)  # p[.., j-1]
        qp = pltpu.roll(p, P - 1, axis=2)  # p[.., j+1]
        lanes = {-1: qm, 0: p, 1: qp}
        t = w[8][None] * p
        for d, (dx, dy) in enumerate(_OFFS8):
            q = lanes[dy]
            if dx:
                q = pltpu.roll(q, (Sr - dx) % Sr, axis=1)
            t = t + w[d][None] * q
        return t

    yield x0
    prev2, prev1 = None, x0
    for k in range(1, K):
        t = lap(prev1)
        if kind == "cheby" and k >= 2:
            t = 2.0 * t - prev2
        yield t
        prev2, prev1 = prev1, t


def _stencil_kernel(kind, K, Tr, Sr, Sd, P, n, C, Cout, B, Fin, Fout,
                    wk_ref, xpad_ref, wpad_ref, out_ref,
                    xw_ref, w_ref, sem_x, sem_w):
    """One (face, band) output tile.

    xpad_ref: (12, C, P_r, P) channels-first in HBM (rows padded to P_r so
    every band DMA is sublane-aligned); wpad_ref: (9, 12, P_r, P) in the
    same coordinates.  wk_ref: (K, Fin, Fout) scalar coefficients in SMEM.
    xw_ref: (C, Sd, P) scratch; w_ref: (9, Sd, P).  out_ref:
    (1, Cout, Tr, n) — channel-first so the lane dim is n (face cols).
    """
    _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd)
    h = (Sr - Tr) // 2
    x0 = xw_ref[:, :Sr, :]
    w = w_ref[:, :Sr, :]

    # per-output-channel AXPY accumulators over the full padded width
    # (sliced to the n interior lanes once, at the very end); everything
    # stays <=3D — Mosaic rejects 4D shape casts
    acc = [None] * Cout
    for k, t in enumerate(_term_stream(kind, K, Sr, P, w, x0)):
        ctr = t[:, h : h + Tr, :]  # (C, Tr, P)
        for b in range(B):
            for fo in range(Fout):
                s = acc[b * Fout + fo]
                for fi in range(Fin):
                    c = wk_ref[k, fi, fo] * ctr[b * Fin + fi]
                    s = c if s is None else s + c
                acc[b * Fout + fo] = s

    res = jnp.stack(acc, axis=0)  # (Cout, Tr, P)
    out_ref[0] = res[:, :, h : h + n].astype(out_ref.dtype)


def _grad_kernel(kind, K, Tr, Sr, Sd, P, n, C, Cout, B, Fin, Fout,
                 xpad_ref, wpad_ref, dy_ref, out_ref,
                 xw_ref, w_ref, sem_x, sem_w):
    """Accumulates dW[k, fi, fo] = sum_bands sum_b <T_k(x)[b, fi], dy[b, fo]>.

    dy_ref: (1, Cout, Tr, P) block, pre-shifted by h lanes so it aligns
    with the band window's padded coordinates (zeros elsewhere — they
    also mask the window's wrap-around garbage lanes).  out_ref:
    (K*Fin, Fout), shared across the (sequential) TPU grid.
    """
    _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd)
    h = (Sr - Tr) // 2
    x0 = xw_ref[:, :Sr, :]
    w = w_ref[:, :Sr, :]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    dy = dy_ref[0]  # (Cout, Tr, P)
    rows = []  # assembled as (K*Fin, Fout) — Mosaic rejects scalar stacks
    for k, t in enumerate(_term_stream(kind, K, Sr, P, w, x0)):
        ctr = t[:, h : h + Tr, :]  # (C, Tr, P)
        for fi in range(Fin):
            cells = []
            for fo in range(Fout):
                s = None
                for b in range(B):
                    c = jnp.sum(
                        ctr[b * Fin + fi] * dy[b * Fout + fo], keepdims=True
                    )
                    s = c if s is None else s + c
                cells.append(s)
            rows.append(jnp.concatenate(cells, axis=1))
    block = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)

    @pl.when(first)
    def _():
        out_ref[...] = block

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + block


def _run_stencil_kernel(st, kind, n_terms, xpad, wpad, wk3, B, interpret):
    """pallas_call plumbing for the forward/dx kernel.

    xpad: (12, C, P_r, P) channels-first, rows padded; wpad: (9, 12, P_r, P)
    in xpad coordinates; wk3: (K, Fin, Fout).  Returns (12, Cout, n, n) f32.
    """
    C = xpad.shape[1]
    K, Fin, Fout = wk3.shape
    Cout = B * Fout
    n, h, P, rh, Tr, Sr, Sd = _band_geometry(st, C, Cout)

    kernel = partial(_stencil_kernel, kind, K, Tr, Sr, Sd, P, n, C, Cout,
                     B, Fin, Fout)
    return pl.pallas_call(
        kernel,
        grid=(12, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # wk3 coefficients
            pl.BlockSpec(memory_space=pl.ANY),  # xpad — bands DMA'd
            pl.BlockSpec(memory_space=pl.ANY),  # wpad — bands DMA'd
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
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(wk3, xpad, wpad)


def _run_grad_kernel(st, kind, n_terms, xpad, wpad, dyp, B, Fin, interpret):
    """dW (K, Fin, Fout) = per-term scalar contractions of the basis of x
    with dy.

    dyp: (12, Cout, n, P) channel-first, lane-aligned to the padded window
    coordinates (see :func:`_grad_kernel`).
    """
    C = xpad.shape[1]
    Cout = dyp.shape[1]
    Fout = Cout // B
    K = n_terms
    n, h, P, rh, Tr, Sr, Sd = _band_geometry(st, C, Cout)

    kernel = partial(_grad_kernel, kind, K, Tr, Sr, Sd, P, n, C, Cout,
                     B, Fin, Fout)
    return pl.pallas_call(
        kernel,
        grid=(12, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xpad
            pl.BlockSpec(memory_space=pl.ANY),  # wpad
            pl.BlockSpec(
                (1, Cout, Tr, P), lambda f, i: (f, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (K * Fin, Fout), lambda f, i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K * Fin, Fout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, Sd, P), jnp.float32),
            pltpu.VMEM((9, Sd, P), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(xpad, wpad, dyp)


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


def _corrected_rows(tables, xflat, wk3, n_terms, kind, B):
    """Exact conv outputs at the corrupt rows via the precomputed ball.

    xflat: (12*n*n, C) face-flat input.  Returns (Rc, B*Fout).
    """
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    t = xflat[tables["corr_src"]].astype(jnp.float32)  # (Bn, C)
    out_rows = tables["corr_out_ball"]
    K, Fin, Fout = wk3.shape
    hi = jax.lax.Precision.HIGHEST

    def term_dot(tk, k):
        return jnp.einsum(
            "rbf,fo->rbo", tk.reshape(-1, B, Fin), wk3[k],
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(-1, B * Fout)

    acc = term_dot(t[out_rows], 0)
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = _ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        acc = acc + term_dot(tk[out_rows], k)
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


def _make_xpad(st, tables, xf):
    """(12, n, n, C) -> (12, C, P_r, P_l) channels-first, rows/lanes padded
    so the fused kernel's band DMAs stay tile-aligned."""
    rh = _round_up(2 * st.n_steps, 8)
    P0 = st.nside + 2 * st.n_steps
    P_l = _round_up(P0, 128)
    xpad = jnp.transpose(_pad_faces_fused(st, tables, xf), (0, 3, 1, 2))
    return jnp.pad(
        xpad, ((0, 0), (0, 0), (0, rh - 2 * st.n_steps), (0, P_l - P0))
    )


def _forward(st, kind, n_terms, B, interpret, tables, xf2d, kernel):
    """xf2d: (M, C) face-flat (C = B*Fin b-major) -> (M, Cout) face-flat."""
    n = st.nside
    M = 12 * n * n
    C = xf2d.shape[-1]
    Fin = C // B
    Fout = kernel.shape[-1]
    Cout = B * Fout

    wk3 = jnp.transpose(
        kernel.astype(jnp.float32).reshape(Fin, n_terms, Fout), (1, 0, 2)
    )  # (K, Fin, Fout)
    xf = xf2d.astype(jnp.float32).reshape(12, n, n, C)
    xpad = _make_xpad(st, tables, xf)
    wpad = tables["weights"].astype(jnp.float32)  # already (9, 12, P_r, P_l)
    y = _run_stencil_kernel(st, kind, n_terms, xpad, wpad, wk3, B, interpret)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(M, Cout)
    if tables["corr_src"].shape[0]:
        y_fix = _corrected_rows(tables, xf2d, wk3, n_terms, kind, B)
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

        # dW: per-term scalar contractions over the same band windows;
        # corrupt rows contribute through the exact ball basis instead of
        # the kernel's garbage values
        wpad = tables["weights"].astype(jnp.float32)
        xf = xf2d.astype(jnp.float32).reshape(12, n, n, C)
        xpad = _make_xpad(st, tables, xf)
        has_corr = bool(tables["corr_src"].shape[0])
        dy_clean = (
            dy.at[tables["corr_out_face"]].set(0.0) if has_corr else dy
        )
        # lane-shift dy by h so it lines up with the window's padded coords
        h = st.n_steps
        P_l = _round_up(n + 2 * h, 128)
        dyp = jnp.pad(
            jnp.transpose(dy_clean.reshape(12, n, n, Cout), (0, 3, 1, 2)),
            ((0, 0), (0, 0), (0, 0), (h, P_l - n - h)),
        )
        dwk = _run_grad_kernel(
            st, kind, n_terms, xpad, wpad, dyp, B, Fin, interpret,
        ).reshape(n_terms, Fin, Fout)
        if has_corr:
            basis = _basis_at_rows(tables, xf2d, n_terms, kind)  # (K, Rc, C)
            dy_rc = dy[tables["corr_out_face"]]  # (Rc, Cout)
            dwk = dwk + jnp.einsum(
                "krbf,rbo->kfo",
                basis.reshape(n_terms, -1, B, Fin),
                dy_rc.reshape(-1, B, Fout),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        dkernel = jnp.transpose(dwk, (1, 0, 2)).reshape(
            Fin * n_terms, Fout
        ).astype(kernel.dtype)

        dtables = jax.tree_util.tree_map(jnp.zeros_like, tables)
        return (dtables, dx, dkernel)

    conv.defvjp(fwd, bwd)
    return conv(tables, xf2d, kernel)
