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
        xpad_ref.at[:, f, pl.ds(i * Tr, Sd), :], xw_ref, sem_x
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

    xpad_ref: (C, 12, P_r, P) channels-first in HBM (rows padded to P_r so
    every band DMA is sublane-aligned); wpad_ref: (9, 12, P_r, P) in the
    same coordinates.  wk_ref: (K, Fin, Fout) scalar coefficients in SMEM.
    xw_ref: (C, Sd, P) scratch; w_ref: (9, Sd, P).  out_ref:
    (Cout, 1, Tr, n) — channel-first so the lane dim is n (face cols).
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
    out_ref[:, 0] = res[:, :, h : h + n].astype(out_ref.dtype)


def _grad_kernel(kind, K, Tr, Sr, Sd, P, n, C, Cout, B, Fin, Fout,
                 xpad_ref, wpad_ref, dy_ref, out_ref,
                 xw_ref, w_ref, sem_x, sem_w):
    """Accumulates dW[k, fi, fo] = sum_bands sum_b <T_k(x)[b, fi], dy[b, fo]>.

    dy_ref: (Cout, 1, Tr, P) block, pre-shifted by h lanes so it aligns
    with the band window's padded coordinates (zeros elsewhere — they
    also mask the window's wrap-around garbage lanes).  out_ref:
    (K*Fin, Fout), shared across the (sequential) TPU grid.
    """
    _band_dma(xpad_ref, wpad_ref, xw_ref, w_ref, sem_x, sem_w, Tr, Sd)
    h = (Sr - Tr) // 2
    x0 = xw_ref[:, :Sr, :]
    w = w_ref[:, :Sr, :]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    dy = dy_ref[:, 0]  # (Cout, Tr, P)
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

    xpad: (C, 12, P_r, P) channels-first, rows padded; wpad: (9, 12, P_r, P)
    in xpad coordinates; wk3: (K, Fin, Fout).  Returns (Cout, 12, n, n) f32.
    """
    C = xpad.shape[0]
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
            (Cout, 1, Tr, n), lambda f, i: (0, f, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Cout, 12, n, n), jnp.float32),
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
    """dW (K*Fin, Fout) = per-term scalar contractions of the basis of x
    with dy.

    dyp: (Cout, 12, n, P) channel-first, lane-aligned to the padded window
    coordinates (see :func:`_grad_kernel`).
    """
    C = xpad.shape[0]
    Cout = dyp.shape[0]
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
                (Cout, 1, Tr, P), lambda f, i: (0, f, i, 0),
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



def _ball_terms(tables, x3, n_terms, kind):
    """Exact per-term basis values over the correction ball.

    x3: (C, 12, n, n) channels-first.  The ball is O(100) rows, so the
    (C, Bn) gather + tiny transpose cost nothing; yields (Bn, C) per term.
    """
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    flat = x3.reshape(x3.shape[0], -1)
    t = jnp.transpose(jnp.take(flat, tables["corr_src"], axis=1))
    t = t.astype(jnp.float32)  # (Bn, C)
    yield t
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = _ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        yield tk
        prev2, prev1 = prev1, tk


def _corrected_rows(tables, x3, wk3, n_terms, kind, B):
    """Exact conv outputs at the corrupt rows via the precomputed ball.

    Returns (Rc, B*Fout).
    """
    out_rows = tables["corr_out_ball"]
    K, Fin, Fout = wk3.shape
    hi = jax.lax.Precision.HIGHEST

    def term_dot(tk, k):
        return jnp.einsum(
            "rbf,fo->rbo", tk.reshape(-1, B, Fin), wk3[k],
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(-1, B * Fout)

    acc = None
    for k, tk in enumerate(_ball_terms(tables, x3, n_terms, kind)):
        d = term_dot(tk[out_rows], k)
        acc = d if acc is None else acc + d
    return acc


def _basis_at_rows(tables, x3, n_terms, kind):
    """Exact per-term basis values at the corrupt rows: (K, Rc, C)."""
    out_rows = tables["corr_out_ball"]
    return jnp.stack(
        [tk[out_rows] for tk in _ball_terms(tables, x3, n_terms, kind)],
        axis=0,
    )


def _corr_patches(st):
    """Static corner-patch metadata: the corrupt rows grouped into small
    per-(face, corner-quadrant) bounding boxes.

    Returns a list of ``(face, x0, y0, sel)`` with ``sel`` a host (rx, ry)
    int32 map of indices into the corrected-row array (-1 = keep the
    kernel's value).  Patching via static-slice updates on these O(h^2)
    boxes replaces a pixel scatter over the full map — XLA materializes
    such a scatter as one or more full-size copies (~15 ms/conv at
    nside=1024).
    """
    if getattr(st, "_corr_patch_cache", None) is None:
        n = st.nside
        ids = np.asarray(st.corr_out_face if hasattr(st, "corr_out_face")
                         else [], dtype=np.int64)
        f = ids // (n * n)
        x = (ids // n) % n
        y = ids % n
        patches = []
        groups = {}
        for i in range(ids.shape[0]):
            key = (int(f[i]), x[i] >= n // 2, y[i] >= n // 2)
            groups.setdefault(key, []).append(i)
        for (face, _, _), idxs in sorted(groups.items()):
            idxs = np.asarray(idxs)
            x0, x1 = int(x[idxs].min()), int(x[idxs].max()) + 1
            y0, y1 = int(y[idxs].min()), int(y[idxs].max()) + 1
            sel = np.full((x1 - x0, y1 - y0), -1, np.int32)
            sel[x[idxs] - x0, y[idxs] - y0] = idxs
            patches.append((face, x0, y0, sel))
        st._corr_patch_cache = patches
    return st._corr_patch_cache


def _patch_corrections(st, y, y_fix):
    """Overwrite the corrupt rows of y (Cout, 12, n, n) with the exact
    values ``y_fix`` (Rc, Cout), via per-corner static-slice updates."""
    yt = jnp.transpose(y_fix)  # (Cout, Rc)
    for face, x0, y0, sel in _corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        patch = y[:, face, x0 : x0 + rx, y0 : y0 + ry]
        vals = yt[:, jnp.clip(selj, 0)]  # (Cout, rx, ry), tiny gather
        patch = jnp.where(selj[None] >= 0, vals, patch)
        y = y.at[:, face, x0 : x0 + rx, y0 : y0 + ry].set(
            patch.astype(y.dtype)
        )
    return y


def _zero_corrections(st, dy):
    """Zero the corrupt rows of dy (Cout, 12, n, n) via the same static
    corner patches (scatter-free)."""
    for face, x0, y0, sel in _corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        patch = dy[:, face, x0 : x0 + rx, y0 : y0 + ry]
        patch = jnp.where(selj[None] >= 0, jnp.zeros_like(patch), patch)
        dy = dy.at[:, face, x0 : x0 + rx, y0 : y0 + ry].set(patch)
    return dy


def _gather_corrections(st, dy):
    """dy values at the corrupt rows, (Rc, Cout) — small patch reads, no
    full-map gather."""
    parts = []
    for face, x0, y0, sel in _corr_patches(st):
        rx, ry = sel.shape
        patch = dy[:, face, x0 : x0 + rx, y0 : y0 + ry].reshape(
            dy.shape[0], rx * ry
        )
        parts.append((patch, sel.reshape(-1)))
    Rc = int(np.asarray(st.corr_out_face).shape[0])
    out = jnp.zeros((Rc, dy.shape[0]), dy.dtype)
    for patch, sel in parts:
        m = sel >= 0
        out = out.at[jnp.asarray(sel[m])].set(
            jnp.transpose(patch[:, jnp.asarray(np.nonzero(m)[0])])
        )
    return out


# ---------------------------------------------------------------------------
# top level with custom VJP
# ---------------------------------------------------------------------------


def _assemble_padded(st, tables, x3):
    """(C, 12, n, n) -> (C, 12, P_r, P_l): halo fill + row/lane alignment
    padding in ONE materialization pass (nested concatenation — XLA fuses
    it into a single output write; the strip gathers are O(nside) rows).

    Replaces the old pad + four dynamic-update-slice chain, which cost
    several full HBM round trips per conv.
    """
    from .stencil import edge_strips

    n, h = st.nside, st.n_steps
    C = x3.shape[0]
    P0 = n + 2 * h
    P_l = _round_up(P0, 128)
    P_r = n + _round_up(2 * h, 8)
    f32 = jnp.float32
    x3 = x3.astype(f32)

    def zeros(*s):
        return jnp.zeros((C, 12) + s, f32)

    west, east, south, north = edge_strips(n, h, x3)
    interior = jnp.concatenate(
        [south, x3, north, zeros(n, P_l - P0)], axis=3
    )  # (C, 12, n, P_l)
    west = jnp.concatenate([west, zeros(h, P_l - P0)], axis=3)
    east = jnp.concatenate([east, zeros(h, P_l - P0)], axis=3)
    return jnp.concatenate(
        [west, interior, east, zeros(P_r - n - 2 * h, P_l)], axis=2
    )


def _forward_cf(st, kind, n_terms, B, interpret, tables, x3, kernel):
    """x3: (C, 12, n, n) channels-first face images (C = B*Fin, b-major)
    -> (Cout, 12, n, n)."""
    n = st.nside
    C = x3.shape[0]
    Fin = C // B
    Fout = kernel.shape[-1]

    wk3 = jnp.transpose(
        kernel.astype(jnp.float32).reshape(Fin, n_terms, Fout), (1, 0, 2)
    )  # (K, Fin, Fout)
    xpad = _assemble_padded(st, tables, x3)
    wpad = tables["weights"].astype(jnp.float32)  # already (9, 12, P_r, P_l)
    y = _run_stencil_kernel(st, kind, n_terms, xpad, wpad, wk3, B, interpret)
    if tables["corr_src"].shape[0]:
        y_fix = _corrected_rows(tables, x3, wk3, n_terms, kind, B)  # (Rc, Cout)
        y = _patch_corrections(st, y, y_fix)
    return y


def fused_stencil_conv_cf(st: FaceStencil, tables, x3, kernel, n_terms, kind,
                          B, interpret=False):
    """Fused K-term polynomial graph conv on channels-first face images.

    This is the zero-permutation hot path: input and output share the
    kernel's native layout, so a chain of convs (the model's face-native
    mode) runs with no transposes at all.

    :param st: FaceStencil built with ``n_steps = n_terms - 1``
    :param tables: device arrays (``stencil_tables(st)`` + correction arrays)
    :param x3: (B*Fin, 12, n, n) face images, batch-major channels
    :param kernel: (Fin*n_terms, Fout)
    :param B: static batch size (the channel packing)
    :return: (B*Fout, 12, n, n), float32
    """

    @partial(jax.custom_vjp, nondiff_argnums=())
    def conv(tables, x3, kernel):
        return _forward_cf(st, kind, n_terms, B, interpret, tables, x3, kernel)

    def fwd(tables, x3, kernel):
        return conv(tables, x3, kernel), (tables, x3, kernel)

    def bwd(res, dy):
        tables, x3, kernel = res
        n = st.nside
        C = x3.shape[0]
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
        dx = _forward_cf(st, kind, n_terms, B, interpret, tables, dy, kernel_t)
        dx = dx.astype(x3.dtype)

        # dW: per-term scalar contractions over the same band windows;
        # corrupt rows contribute through the exact ball basis instead of
        # the kernel's garbage values
        wpad = tables["weights"].astype(jnp.float32)
        xpad = _assemble_padded(st, tables, x3)
        has_corr = bool(tables["corr_src"].shape[0])
        dy_clean = _zero_corrections(st, dy) if has_corr else dy
        # lane-shift dy by h so it lines up with the window's padded coords
        h = st.n_steps
        P_l = _round_up(n + 2 * h, 128)
        dyp = jnp.pad(dy_clean, ((0, 0), (0, 0), (0, 0), (h, P_l - n - h)))
        dwk = _run_grad_kernel(
            st, kind, n_terms, xpad, wpad, dyp, B, Fin, interpret,
        ).reshape(n_terms, Fin, Fout)
        if has_corr:
            basis = _basis_at_rows(tables, x3, n_terms, kind)  # (K, Rc, C)
            dy_rc = _gather_corrections(st, dy)  # (Rc, Cout)
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
    return conv(tables, x3, kernel)


def fused_stencil_conv(st: FaceStencil, tables, xf2d, kernel, n_terms, kind, B,
                       interpret=False):
    """Fused conv on (M, C) face-flat activations — thin transpose wrapper
    around :func:`fused_stencil_conv_cf` (autodiff handles the transposes).

    :param xf2d: (M, B*Fin) face-flat activations, batch-major channels
    :return: (M, B*Fout) face-flat, float32
    """
    M, C = xf2d.shape
    n = st.nside
    x3 = jnp.transpose(xf2d).reshape(C, 12, n, n)
    y3 = fused_stencil_conv_cf(
        st, tables, x3, kernel, n_terms, kind, B, interpret=interpret
    )
    return jnp.transpose(y3.reshape(y3.shape[0], M))
