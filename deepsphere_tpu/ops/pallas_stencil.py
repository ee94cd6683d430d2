"""Fused Pallas TPU kernel: the full K-term polynomial stencil conv.

The XLA stencil path (:mod:`.stencil`) materializes every Laplacian
application in HBM (K round trips of the activation).  This kernel keeps the
whole Chebyshev / monomial recursion in VMEM: the grid walks row bands of
each face; each grid step assembles one halo-extended band window directly
in VMEM (DMA pieces from the activation plus precomputed halo-strip
arrays), runs all K-1 Laplacian applications on-chip, and folds the
``[K*Fin, Fout]`` contraction into the recursion term by term.  HBM traffic
is ~1.1 reads + 1 write of the activation per conv.

Layout: activations live as ``(C, 12, n, P_l)`` channels-first face images
with face column y at lane ``y + h`` (h = K-1 halo depth) and
``P_l = roundup(n + 2h, 128)`` — input and output of the conv share it, so
chains of convs run with zero layout changes and no full-size halo
materialization pass:

* Both spatial axes ride the VPU's (sublane, lane) register dims at full
  width; every array in the hot loop is lane-tile aligned.
* Cross-face halos are *structured edge copies* (see
  :func:`..sphere.faces.edge_descriptor` / :func:`.stencil.edge_strips`),
  built per conv as three small strip arrays.  Row-halo strips enter the
  window via aligned DMA pieces (DMA row slices must be 8-aligned in offset
  AND size — hence the R = roundup(h, 8) window margin, with tolerated
  garbage rows in the gap); lane-halo strips land via masked sub-lane
  stores.  The alternatives are far slower: XLA dynamic-update-slice halo
  writes at nside=1024 measure ~1.5 s/conv, and scatter/gather halo fills
  run ~50x below bandwidth.
* The nine stencil taps are fixed ±1 ``pltpu.roll`` shifts on full-size
  arrays; border wrap-around garbage advances one row/lane per recursion
  step and never reaches the (R, h)-offset center that is written out.
* The channel contraction runs on the VPU as scalar-AXPY accumulation
  (kernel coefficients in SMEM): at the typical C = batch*Fin of this
  workload an MXU matmul would be <2% utilized and needs a massive
  relayout per term; the AXPY form needs neither.

The rectangular face extension is geometrically incomplete at the 8 polar
3-way corners (see :mod:`..graph.stencil`), so a constant number of rows
near those corners computes garbage under fused multi-step recursion; they
are re-computed exactly afterwards from a precomputed O(100)-row "ball"
ELLPACK and patched in via static per-corner box updates (forward AND both
backward passes) — a full-map pixel scatter would cost full-size copies.

A custom VJP makes the backward pass reuse the same kernel: the rescaled
Laplacian is symmetric, so dx runs the identical recursion on the incoming
cotangent with the transposed channel kernel, and dW accumulates per-term
scalar contractions in a second kernel over the same band windows.
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
from .._logger import logger
from ..graph.stencil import FaceStencil

__all__ = [
    "fused_stencil_conv",
    "fused_stencil_conv_cf",
    "fused_stencil_conv_cfp",
    "fused_available",
    "cfp_geometry",
]


def _round_up(x, m):
    return -(-x // m) * m


def cfp_structural_available(st: FaceStencil, kind, n_terms):
    """Whether this configuration fits the fused kernel / native padded
    layout STRUCTURALLY (platform-independent — the model assembler plans
    layouts with this so a model built on CPU applies unchanged on TPU)."""
    if st is None:  # graph not stencil-representable / halo too deep
        return False
    if kind not in ("cheby", "mono"):
        return False
    if n_terms < 2:
        return False
    h = st.n_steps  # halo depth (may exceed the strict radius*(K-1)
    # requirement: deep_stencil rounds unaligned depths up to the sublane
    # tile; the extra rows are valid-but-unused margin)
    if h < getattr(st, "radius", 1) * (n_terms - 1):
        return False
    # window DMA pieces need 8-aligned row slices: n must be a multiple of
    # 8 and at least the R = roundup(h, 8) window margin; both lane-halo
    # strips pack into one 128-lane DMA array (west at [0,h), east at
    # [h,2h)), so 2h must fit a lane tile
    if st.nside % 8 or st.nside < _round_up(h, 8) or 2 * h > 128:
        return False
    return True


def fused_available(st: FaceStencil, kind, n_terms, unroll=None):
    """Whether the fused kernel runs here (structure + a pallas backend).

    ``unroll`` (B*Fin*Fout*n_terms, when the caller knows it): dot-mode
    configs additionally require ``nside >= config.dot_fused_min_nside``
    in compiled mode — small fused convs at large channel counts add
    Mosaic-kernel program mass to training executables for no measurable
    win, and multi-layer dot-mode train programs crossed an XLA
    compile-complexity cliff that hard-faults the worker (round 5).

    Verified-envelope gate (rounds 3-4): on real TPU hardware, halo depths
    h > 8 that are NOT sublane-aligned hard-fault the worker at a Mosaic
    level below anything visible in the kernel source — radius-1 K=10
    (h=9, the quick_start architecture) and radius-3 K=5 (h=12) both
    crash a clean chip, while h<=8 and every 8-aligned deeper h (16, 24)
    pass; piece-level bisection (tools/probe_r3_constructs.py, DS_KB)
    shows every construct passing in isolation and pure window DMA still
    faulting.  Round-4 mitigation: :meth:`deep_stencil` rounds unaligned
    depths UP to the sublane tile (valid-but-unused margin rows), so every
    stencil built through the framework lands in the verified class and
    runs fused.  This gate remains only for hand-built stencils with an
    explicitly unaligned ``n_steps``; those fall back to the per-step XLA
    stencil path (correct, slower).  Interpret mode (CPU) is unaffected.

    Radius >= 3 additionally declines in compiled mode as a PERFORMANCE
    choice (measured slower fused than the XLA stencil path — see the
    inline comment; ``DS_ALLOW_FUSED_R3=1`` forces fused)."""
    mode = config.pallas_mode()
    if mode is None:
        return False
    if not cfp_structural_available(st, kind, n_terms):
        return False
    if mode == "compile" and st.n_steps > 8 and st.n_steps % 8:
        return False
    if (mode == "compile" and unroll is not None
            and config.resolve_contract(unroll) == "dot"
            and st.nside < config.dot_fused_min_nside):
        return False
    if (mode == "compile" and (getattr(st, "radius", 1) or 1) >= 3
            and n_terms > 2 and not os.environ.get("DS_ALLOW_FUSED_R3")):
        # PERFORMANCE gate, not a fault gate (round 4): radius >= 3 runs
        # correctly fused after the sublane-tile padding (k=40@128 err
        # 7.2e-7, k=60@128 err 4.8e-7 on chip) but the deep ONE-SHOT form
        # (h = r*(K-1), all K laps in one launch) materializes (2r+1)^2
        # tap planes + per-lap roll temporaries that shrink the band and
        # measures ~2.7x SLOWER than the per-step XLA stencil (k=40@128
        # K=5: 30.92 ms fused vs 11.43 ms XLA; k=60@128: 40.08 ms fused).
        # Radius <= 2 stays fused (it wins there).  SINGLE-LAP launches
        # (n_terms == 2, h == r) are exempt: they carry no deep window and
        # measured fast on-chip (radius-3 single lap 2.72 ms @ nside=64,
        # tools/probe_r3_constructs.py) — the lap-chain conv
        # (ops.stencil.lap_chain_conv) builds deep-k convs out of them.
        return False
    # NOTE: the 8 here is the f32 sublane count, and only f32 I/O configs
    # were bisected on hardware.  Under bfloat16_io the window margin
    # rounds to roundup(h, 16) internally, so a deep h that is 8- but not
    # 16-aligned (e.g. 24) passes this gate while sitting outside the
    # verified envelope; bf16 I/O is opt-in and slower on this workload
    # (PERFORMANCE.md), so the gate stays f32-calibrated (ADVICE r3).
    return True


def cfp_geometry(n, h):
    """(R, P_l) of the conv's native layout: R = roundup(h, 8) window
    margin, P_l = roundup(n + 2h, 128) padded lane width (face col y at
    lane y + h).  (R here is the f32 margin; the bf16-I/O kernel widens it
    to roundup(h, 16) internally — P_l and the layout are unaffected.)"""
    return _round_up(h, 8), _round_up(n + 2 * h, 128)


def _sublane(iodt):
    """DMA row-alignment granule for HBM arrays of this dtype: the sublane
    tile is (8, 128) for f32 and (16, 128) for bf16 — row slices of DMA
    descriptors must be aligned in offset AND size."""
    return 16 if iodt == jnp.bfloat16 else 8


def cfp_io_available(st: FaceStencil):
    """Whether this conv can run with bf16 HBM I/O (stage B): the wider
    R = roundup(h, 16) window margin must still satisfy the 16-aligned
    DMA slicing constraints (n % 16 == 0, n >= R)."""
    h = st.n_steps
    return st.nside % 16 == 0 and st.nside >= _round_up(h, 16)


def _vmem_budget(lap_temps=0):
    """Band working-set envelope checked against :func:`_vmem_est`.  Two
    on-chip calibration classes (v5e, 128 MiB VMEM hard limit):

    * radius-1 (``lap_temps == 0``): the 6-copy recursion-state model is
      conservative — the largest production shape (nside=1024, C=16,
      Tr=128) has est = 127 MB and compiles + runs inside the hard limit
      (round 4: 12.73 ms vs 13.82 ms at the Tr=64 the old 96 MB budget
      forced), so the default envelope is 127 MB.
    * radius >= 2: the per-lap roll temporaries dominate and the estimate
      UNDERSHOT once (k=20@256 round-2: 140 MB actual vs 51 MB estimated
      with the radius-1 formula -> compile OOM recorded as a worker
      crash), so the envelope stays at the safer 96 MB.

    ``DS_PALLAS_VMEM_MB`` overrides both."""
    env = os.environ.get("DS_PALLAS_VMEM_MB")
    if env is not None:
        return int(env) * 2**20
    return (127 if lap_temps == 0 else 96) * 2**20


def _vmem_est(Tr, R, P, C, cout, nplanes, io_blocks, band_bytes, io_bytes,
              lap_temps=0):
    """Working-set estimate of one kernel instance at band height Tr.

    ``lap_temps``: extra live band-sized temporaries of the recursion laps
    beyond the radius-1 baseline.  Radius-2 stencils materialize 2r+1
    lane-rolled copies of the band plus per-dx partial sums in every lap,
    and Mosaic does not reuse those buffers across the unrolled K-1 laps —
    measured on-chip at nside=256/k=20/K=5: 140.2M actual vs 51M estimated
    with the radius-1 formula (compile-time VMEM OOM through the tunnel;
    the round-2 bench recorded it as a TPU worker crash, VERDICT.md #2)."""
    Sd = Tr + 2 * R
    return (
        # recursion state (prev2/prev1/t) + roll temps, band dtype
        band_bytes * (6 + lap_temps) * C * Sd * P
    ) + io_bytes * (
        2 * (C + nplanes) * Sd * P  # double-buffered band scratch
        + 2 * C * Sd * 128  # double-buffered packed lane-strip scratch
        + io_blocks * cout * Tr * P  # double-buffered in/out blocks
    ) + 4 * (
        cout * Tr * P  # AXPY / dot accumulators (f32)
    )


def _pick_band(n, R, P, C, cout, nplanes=9, io_blocks=2, band_bytes=4,
               io_bytes=4, lap_temps=0, budget_lap_temps=None):
    """Row-band height Tr: the largest power-of-two band whose working set
    (recursion state + weight planes + accumulators + pipeline buffers)
    fits the VMEM budget.  ``io_blocks``: number of double-buffered
    (cout, Tr, P) pipeline blocks (2 = output only; the fused dx+dW kernel
    adds a double-buffered x input block -> 4).  ``band_bytes``: bytes per
    element of the recursion state (2 in bf16 band mode — the in-kernel
    cast halves the live temporaries, affording a larger band).
    ``io_bytes``: bytes per element of the DMA scratch and pipeline blocks
    (2 in bf16-I/O mode).  Bands must be ``align``-row aligned so every
    DMA row slice is (align = sublane tile height of the I/O dtype).

    ``budget_lap_temps``: the RADIUS-derived temp count that selects the
    VMEM envelope class (radius-1 -> 127 MiB, radius>=2 -> 96 MiB).
    ``lap_temps`` — which may additionally fold in contraction-retained
    band temporaries (``extra_band_temps``) — only inflates the working-set
    *estimate*; folding it into the budget class too made radius-1
    dot-mode runs size against the 96 MiB envelope (ADVICE r4 #1)."""
    if budget_lap_temps is None:
        budget_lap_temps = lap_temps
    budget = _vmem_budget(budget_lap_temps)
    align = 16 if io_bytes == 2 else 8
    for Tr in (512, 256, 128, 64, 32, 16, 8):
        if Tr > n or n % Tr or Tr < R or Tr % align:
            continue
        est = _vmem_est(Tr, R, P, C, cout, nplanes, io_blocks, band_bytes,
                        io_bytes, lap_temps)
        if est <= budget:
            return Tr
    # fallback under extreme VMEM pressure / odd R: the smallest divisor of
    # n that is align-aligned and >= R (n itself always qualifies — the
    # structural gates require n % align == 0 and n >= R), so the grid
    # always covers all n rows.
    for Tr in range(align, n + 1, align):
        if n % Tr == 0 and Tr >= R:
            return Tr
    return n


def _band_geometry(st, C, cout, io_blocks=2, bdt=None, iodt=None,
                   extra_band_temps=0):
    """``extra_band_temps``: additional live band-sized (C, ~Sd, P)
    buffers in band dtype beyond the recursion baseline — the stacked
    MXU contraction retains the K term centers, so its callers pass
    ``K`` here (slightly conservative: centers are Tr-, not Sd-, high)."""
    n = st.nside
    h = st.n_steps
    _, P = cfp_geometry(n, h)
    R = _round_up(h, _sublane(iodt))
    band_bytes = 2 if bdt == jnp.bfloat16 else 4
    io_bytes = 2 if iodt == jnp.bfloat16 else 4
    # radius-2+ stencils: 2r+1 lane-rolled band copies + per-dx partials
    # stay live per lap, and Mosaic does not reuse them across the K-1
    # unrolled laps (on-chip measured — see _vmem_est)
    radius = getattr(st, "radius", 1) or 1
    lap_temps = 0 if radius <= 1 else (h // radius) * (2 * radius + 1)
    Tr = _pick_band(n, R, P, C, cout, nplanes=len(st.offsets),
                    io_blocks=io_blocks, band_bytes=band_bytes,
                    io_bytes=io_bytes,
                    lap_temps=lap_temps + extra_band_temps,
                    budget_lap_temps=lap_temps)
    Sd = Tr + 2 * R
    return n, h, R, P, Tr, Sd


def _band_copies(n, h, R, Tr, Sd, P, f, i, slot,
                 xc_ref, w_ref, top_ref, bot_ref, ls_ref,
                 xw2, ww2, ss2, sems2, start):
    """Create and start (or wait on) the DMA pieces of band (f, i) into
    double-buffer slot ``slot``.

    Window row w holds face row ``i*Tr - R + w``; rows outside the h-deep
    real halo are tolerated garbage (it advances 1 row per recursion step
    and never reaches the center rows [R, R+Tr)).  All DMA row slices are
    aligned in offset and size to the I/O dtype's sublane tile (8 rows for
    f32, 16 for bf16 — _pick_band aligns Tr and _band_geometry aligns R to
    the same granule).  Start and wait reconstruct identical descriptors
    under identical predicates.
    """
    nbands = n // Tr  # static
    # the compiler alignment promise must match the scratch dtype's tile
    align = _sublane(xw2.dtype)

    def go(copies):
        for c in copies:
            (c.start if start else c.wait)()

    def dma(src, dst, k):
        return pltpu.make_async_copy(src, dst, sems2.at[slot, k])

    def x_and_w(m0, size, d0):
        m0 = pl.multiple_of(m0, align)
        return [
            dma(xc_ref.at[:, f, pl.ds(m0, size), :],
                xw2.at[slot, :, pl.ds(d0, size), :], 0),
            dma(w_ref.at[:, f, pl.ds(m0, size), :],
                ww2.at[slot, :, pl.ds(d0, size), :], 1),
            # lane-halo strips (west at lanes [0,h), east at [h,2h)) for
            # the interior-face rows of the window — one packed DMA
            dma(ls_ref.at[:, f, pl.ds(m0, size), :],
                ss2.at[slot, :, pl.ds(d0, size), :], 2),
        ]

    def top():
        return [
            dma(top_ref.at[:, f], xw2.at[slot, :, 0:R, :], 3),
            dma(w_ref.at[:, f, pl.ds(n, R), :], ww2.at[slot, :, 0:R, :], 4),
        ]

    def bot():
        return [
            dma(bot_ref.at[:, f], xw2.at[slot, :, pl.ds(Sd - R, R), :], 5),
            dma(w_ref.at[:, f, pl.ds(n + R, R), :],
                ww2.at[slot, :, pl.ds(Sd - R, R), :], 6),
        ]

    if nbands == 1:
        go(x_and_w(0, n, R) + top() + bot())
    else:
        # static-shape DMA per band position (pallas needs static sizes;
        # row offsets stay align-aligned because Tr and R are)
        @pl.when(i == 0)
        def _():
            go(x_and_w(0, Tr + R, R) + top())

        @pl.when(i == nbands - 1)
        def _():
            go(x_and_w((nbands - 1) * Tr - R, Tr + R, 0) + bot())

        if nbands > 2:
            @pl.when((i > 0) & (i < nbands - 1))
            def _():
                go(x_and_w(i * Tr - R, Tr + 2 * R, 0))


def _assemble_window(n, h, R, Tr, Sd, P,
                     xc_ref, w_ref, top_ref, bot_ref, ls_ref,
                     xw2, ww2, ss2, sems2):
    """Double-buffered window assembly: prefetch the next band's DMA into
    the other slot before waiting on this band's, so the HBM traffic of
    band k+1 overlaps the recursion compute of band k.  Returns the slot
    holding this band's window."""
    f = pl.program_id(0)
    i = pl.program_id(1)
    nbands = n // Tr
    step = f * nbands + i
    slot = jax.lax.rem(step, 2)
    geo = (n, h, R, Tr, Sd, P)
    refs = (xc_ref, w_ref, top_ref, bot_ref, ls_ref,
            xw2, ww2, ss2, sems2)

    @pl.when(step == 0)
    def _():
        _band_copies(*geo, f, i, slot, *refs, start=True)

    last = i == nbands - 1
    nf = jax.lax.select(last, f + 1, f)
    ni = jax.lax.select(last, 0, i + 1)

    @pl.when(step + 1 < 12 * nbands)
    def _():
        _band_copies(*geo, nf, ni, jax.lax.rem(step + 1, 2), *refs,
                     start=True)

    _band_copies(*geo, f, i, slot, *refs, start=False)

    # masked sub-lane stores: lane halos for interior-face window rows
    # (west strip at packed lanes [0,h), east at [h,2h)).  For edge bands
    # the non-interior rows got full-width strip data from top()/bot(),
    # and the ss scratch rows there are stale — restrict the store to the
    # interior-face row range.
    if config.kernel_bisect() == "nolanestore":  # dev-only bisection
        return slot

    def store(r0, r1):
        xw2[slot, :, r0:r1, 0:h] = ss2[slot, :, r0:r1, 0:h]
        xw2[slot, :, r0:r1, h + n : h + n + h] = ss2[slot, :, r0:r1, h:2 * h]

    if nbands == 1:
        store(R, R + n)
    else:
        @pl.when(i == 0)
        def _():
            store(R, Sd)

        @pl.when(i == nbands - 1)
        def _():
            store(0, Sd - R)

        if nbands > 2:
            @pl.when((i > 0) & (i < nbands - 1))
            def _():
                store(0, Sd)
    return slot


def _roll(x, shift, axis):
    """``pltpu.roll`` that also works for 16-bit dtypes.

    Mosaic lowers roll to ``tpu.dynamic_rotate``, which some libtpu
    versions only implement for 32-bit data ("Rotate with non-32-bit
    data").  bf16 packs two sublane rows per 32-bit register row, so a
    lane rotate — and an even sublane rotate — of the ``pltpu.bitcast``
    i32 view is exact (on-chip verified, see tools/tpu_checks.py stage 4);
    odd sublane rotates round-trip through f32 (value-exact: f32 holds
    every bf16 value).
    """
    shift = shift % x.shape[axis]
    if shift == 0:
        return x
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift, axis=axis)
    if axis == x.ndim - 1:
        p = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(p, shift, axis=axis), x.dtype)
    assert axis == x.ndim - 2, "16-bit roll only on sublane/lane axes"
    if shift % 2 == 0 and x.shape[axis] % 2 == 0:
        p = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(p, shift // 2, axis=axis), x.dtype)
    return pltpu.roll(x.astype(jnp.float32), shift, axis=axis).astype(x.dtype)


def _term_stream(kind, K, Sr, P, w, x0, radius=1):
    """Yield the K recursion terms on a full-size (C, Sr, P) band window.

    Every term is full-size: the (2r+1)^2 taps are fixed circular shifts
    (``pltpu.roll``), so wrap-around garbage creeps in ``radius``
    rows/lanes per step from the window border.  Callers only consume the
    (R, h)-offset center, which stays exact for all steps (h = r*(K-1)).

    Sublane-roll factorization: ``w_d * S_x^dx(q) = S_x^dx(S_x^-dx(w_d)
    * q)``, so pre-shifting each weight plane by +dx ONCE per band (cheap:
    plane-sized, amortized over K-1 laps) lets the accumulation group by
    dx and hoist the per-tap sublane roll out of the inner sum — 2r
    C-sized sublane rolls per lap instead of up to (2r+1)^2 - (2r+1).
    The pre-shift wraps weight rows at the window border, corrupting only
    the same <= r-deep border margin the tap rolls already corrupt; the
    garbage still advances r rows per step and never reaches the center.
    """
    from ..graph.stencil import stencil_offsets

    offs = stencil_offsets(radius)
    nc = len(offs) - 1  # center plane (last)

    # group planes by dx; shift = +dx on the sublane axis (w~(i) = w(i-dx))
    groups = {}  # dx -> list of ((1, Sr, P) plane, dy)
    for d, (dx, dy) in enumerate(offs[:-1]):
        wd = w[d : d + 1]
        if dx:
            wd = _roll(wd, (Sr + dx) % Sr, axis=1)
        groups.setdefault(dx, []).append((wd, dy))
    groups.setdefault(0, []).append((w[nc : nc + 1], 0))

    def lap(p, g):
        lanes = {0: p}
        for dy in range(1, radius + 1):
            lanes[-dy] = _roll(p, dy, axis=2)  # p[.., j-dy]
            lanes[dy] = _roll(p, P - dy, axis=2)  # p[.., j+dy]
        t = None
        for dx, planes in g.items():
            u = None
            for wd, dy in planes:
                c = wd * lanes[dy]
                u = c if u is None else u + c
            if dx:
                u = _roll(u, (Sr - dx) % Sr, axis=1)
            t = u if t is None else t + u
        return t

    # Chebyshev fold: 2·lap_w(p) == lap_{2w}(p) exactly (×2 is an exponent
    # bump), so pre-doubling the weight planes once per band (plane-sized,
    # no C factor) saves one full-band multiply on every k>=2 lap.
    groups2 = None
    yield x0
    prev2, prev1 = None, x0
    for k in range(1, K):
        if kind == "cheby" and k >= 2:
            if groups2 is None:
                groups2 = {
                    dx: [(wd + wd, dy) for wd, dy in planes]
                    for dx, planes in groups.items()
                }
            t = lap(prev1, groups2) - prev2
        else:
            t = lap(prev1, groups)
        yield t
        prev2, prev1 = prev1, t


def _stencil_kernel(kind, K, radius, contract, bdt, n, h, R, Tr, Sd, P, C,
                    Cout, B, Fin, Fout, wk_ref, wkT_ref, xc_ref, w_ref,
                    top_ref, bot_ref, ls_ref, out_ref, xw, ww, ss, sems):
    """One (face, band) output tile.

    xc_ref: (C, 12, n, P) activations in HBM; w_ref: (T2, 12, n+2R, P)
    wrapped-extended weight planes; top/bot_ref: (C, 12, R, P) row-halo
    strips; ls_ref: (C, 12, n, 128) packed lane-halo strips (west at
    lanes [0,h), east at [h,2h)).
    wk_ref: (K, Fin, Fout) scalar coefficients in SMEM (axpy contraction);
    wkT_ref: (K, Fout, Fin) in VMEM (dot contraction).
    out_ref: (Cout, 1, Tr, P) — full padded width, no final slice.
    bdt: band compute dtype (config.band_dtype()); bf16 casts the window
    + weight planes ONCE after assembly, halving the recursion's VMEM
    traffic; the DMA pieces and the output stay f32.
    """
    slot = _assemble_window(n, h, R, Tr, Sd, P, xc_ref, w_ref, top_ref,
                            bot_ref, ls_ref, xw, ww, ss, sems)
    x0 = xw[slot].astype(bdt)
    w = ww[slot].astype(bdt)

    kb = set(config.kernel_bisect().split(","))  # kernel-cost bisection
    kb_mode = config.kernel_bisect()  # (dev only; comma-combinable)
    if "norecur" in kb:
        terms = [(k, x0) for k in range(K)]
    else:
        terms = enumerate(_term_stream(kind, K, Sd, P, w, x0, radius))

    if contract == "dots" and "nocontract" not in kb:
        # stacked MXU contraction: retain the K term centers, then ONE
        # (Fout, K*Fin) x (K*Fin, Tr*P) matmul per batch — K x fewer MXU
        # passes than the per-(term, batch) dot and no per-term accumulate
        # adds on the VPU.  Engaged only when the K retained center slices
        # fit the VMEM budget (see _run_stencil_kernel).  wkT_ref is
        # (Fout, K*Fin) in this mode, column index = k*Fin + fi.
        prec = (config.precision() if bdt == jnp.float32
                else jax.lax.Precision.DEFAULT)
        ctrs = [t[:, R : R + Tr, :] for _, t in terms]
        outs = []
        for b in range(B):
            ab = jnp.concatenate(
                [c[b * Fin : (b + 1) * Fin] for c in ctrs], axis=0
            ).reshape(K * Fin, Tr * P)
            yb = jnp.dot(
                wkT_ref[...].astype(bdt), ab,
                preferred_element_type=jnp.float32, precision=prec,
            )
            outs.append(yb.reshape(Fout, Tr, P))
        y = outs[0] if B == 1 else jnp.concatenate(outs, axis=0)
        out_ref[:, 0] = y.astype(out_ref.dtype)
        return

    if contract == "dot" and "nocontract" not in kb:
        # per-(term, batch) MXU matmul (Fout, Fin) x (Fin, Tr*P): O(B*K)
        # emitted ops instead of the O(B*Fin*Fout*K) scalar-AXPY unroll —
        # the unroll count is also Mosaic COMPILE time, which explodes at
        # realistic channel counts (quick_start: 4000 AXPYs per tile)
        acc = None
        prec = (config.precision() if bdt == jnp.float32
                else jax.lax.Precision.DEFAULT)  # bf16 inputs: native MXU
        for k, t in terms:
            ctr = t[:, R : R + Tr, :]  # (C, Tr, P)
            outs = []
            for b in range(B):
                ab = ctr[b * Fin : (b + 1) * Fin].reshape(Fin, Tr * P)
                yb = jnp.dot(
                    wkT_ref[k].astype(bdt), ab,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                outs.append(yb.reshape(Fout, Tr, P))
            y = outs[0] if B == 1 else jnp.concatenate(outs, axis=0)
            acc = y if acc is None else acc + y
        out_ref[:, 0] = acc.astype(out_ref.dtype)
        return

    acc = [None] * Cout
    for k, t in terms:
        ctr = t[:, R : R + Tr, :]  # (C, Tr, P)
        if "nocontract" in kb:
            acc = [ctr[co % C] for co in range(Cout)]
            continue
        for b in range(B):
            for fo in range(Fout):
                s = acc[b * Fout + fo]
                for fi in range(Fin):
                    c = wk_ref[k, fi, fo] * ctr[b * Fin + fi]
                    s = c if s is None else s + c
                acc[b * Fout + fo] = s

    out_ref[:, 0] = jnp.stack(acc, axis=0).astype(out_ref.dtype)


def _grad_kernel(kind, K, radius, contract, bdt, n, h, R, Tr, Sd, P, C,
                 Cout, B, Fin, Fout, xc_ref, w_ref, top_ref, bot_ref,
                 ls_ref, dy_ref, out_ref, xw, ww, ss, sems):
    """Accumulates dW[k, fi, fo] = sum_bands sum_b <T_k(x)[b, fi], dy[b, fo]>.

    dy_ref: (Cout, 1, Tr, P) block in the conv's native layout; its
    non-interior lanes (halo/pad — garbage) are masked to zero in VMEM.
    out_ref: (K*Fin, Fout), shared across the (sequential) TPU grid.
    bdt: band compute dtype; bf16 halves the recursion's VMEM traffic
    (dW still accumulates in f32 — dot via preferred_element_type, axpy
    via the f32 dy promoting each product).
    """
    slot = _assemble_window(n, h, R, Tr, Sd, P, xc_ref, w_ref, top_ref,
                            bot_ref, ls_ref, xw, ww, ss, sems)
    x0 = xw[slot].astype(bdt)
    w = ww[slot].astype(bdt)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (Tr, P), 1)
    interior = (lane >= h) & (lane < h + n)
    dy = jnp.where(interior[None], dy_ref[:, 0], 0.0)  # (Cout, Tr, P)

    if contract == "dot":
        # per-(term, batch) MXU contraction over the flattened (Tr*P)
        # plane: (Fin, Tr*P) x (Fout, Tr*P) -> (Fin, Fout).  Contraction
        # must be a SINGLE dim (Mosaic tpu.matmul rejects multi-dim
        # contractions); the merge reshape is the same one the forward
        # dot path uses.
        dy2 = dy.reshape(Cout, Tr * P).astype(bdt)
        prec = (config.precision() if bdt == jnp.float32
                else jax.lax.Precision.DEFAULT)
        blocks = []
        for k, t in enumerate(_term_stream(kind, K, Sd, P, w, x0, radius)):
            ctr = t[:, R : R + Tr, :].reshape(C, Tr * P)
            acc_k = None
            for b in range(B):
                g = jax.lax.dot_general(
                    ctr[b * Fin : (b + 1) * Fin],
                    dy2[b * Fout : (b + 1) * Fout],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                acc_k = g if acc_k is None else acc_k + g
            blocks.append(acc_k)
        block = jnp.concatenate(blocks, axis=0).astype(out_ref.dtype)
    else:
        rows = []  # assembled as (K*Fin, Fout) — Mosaic rejects scalar stacks
        for k, t in enumerate(_term_stream(kind, K, Sd, P, w, x0, radius)):
            ctr = t[:, R : R + Tr, :]  # (C, Tr, P)
            for fi in range(Fin):
                cells = []
                for fo in range(Fout):
                    s = None
                    for b in range(B):
                        c = (ctr[b * Fin + fi] * dy[b * Fout + fo]).astype(
                            jnp.float32
                        )
                        s = c if s is None else s + c
                    # accumulate the B products elementwise, reduce once
                    # per cell (see _dxdw_kernel: 4x fewer reduce passes)
                    cells.append(jnp.sum(s, keepdims=True))
                rows.append(jnp.concatenate(cells, axis=1))
        block = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)

    @pl.when(first)
    def _():
        out_ref[...] = block

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + block


def _dxdw_kernel(kind, K, radius, contract, bdt, n, h, R, Tr, Sd, P, C,
                 Cout, B, Fin, Fout, wk_ref, wkT_ref, xc_ref, w_ref, top_ref,
                 bot_ref, ls_ref, xr_ref, mask_ref, out_ref, dw_ref, xw, ww,
                 ss, sems):
    """dx AND dW in one band pass over dy (the adjoint trick: L~ is
    symmetric, so dW[k] = <T_k(L~) x, dy> = <x, T_k(L~) dy> — the same
    recursion terms this dx pass already materializes in VMEM.  The
    separate dW kernel's duplicate recursion over x, and its band/strip
    traffic, disappear from the training step entirely).

    Invoked with swapped channel roles relative to the forward: xc_ref is
    dy (C = B*Fout_orig recursion channels, Fin = Fout_orig,
    Fout = Fin_orig), out_ref is the dx block.  xr_ref: (Cout, 1, Tr, P)
    block of the forward input x (corrupt rows pre-zeroed by the caller);
    its non-interior lanes are masked here so halo/pad garbage cannot
    leak into dW.  dw_ref: (K*Fout, Fin) = (K*Fin_orig, Fout_orig) in the
    original orientation, accumulated across the sequential TPU grid.
    """
    slot = _assemble_window(n, h, R, Tr, Sd, P, xc_ref, w_ref, top_ref,
                            bot_ref, ls_ref, xw, ww, ss, sems)
    x0 = xw[slot].astype(bdt)
    w = ww[slot].astype(bdt)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    # mask selects the interior lanes AND zeroes the corrupt corner rows
    # (built once in stencil_tables; doing the corrupt-row zeroing here
    # instead of on the full x array outside saved a whole-map XLA input
    # copy, ~2.4 ms at nside=1024)
    xr = jnp.where(mask_ref[0] > 0, xr_ref[:, 0], 0.0)  # (Cout, Tr, P)

    prec = (config.precision() if bdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = None  # dot-mode dx accumulator
    accs = [None] * Cout  # axpy-mode dx accumulators
    dwb = []  # per-term dW blocks, k-major
    if contract == "dot":
        xr2 = xr.reshape(Cout, Tr * P).astype(bdt)
    for k, t in enumerate(_term_stream(kind, K, Sd, P, w, x0, radius)):
        ctr = t[:, R : R + Tr, :]  # (C, Tr, P)
        if contract == "dot":
            ctr2 = ctr.reshape(C, Tr * P)
            outs = []
            gk = None
            for b in range(B):
                ab = ctr2[b * Fin : (b + 1) * Fin]
                yb = jnp.dot(
                    wkT_ref[k].astype(bdt), ab,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                outs.append(yb.reshape(Fout, Tr, P))
                g = jax.lax.dot_general(
                    xr2[b * Fout : (b + 1) * Fout], ab,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
                gk = g if gk is None else gk + g
            y = outs[0] if B == 1 else jnp.concatenate(outs, axis=0)
            acc = y if acc is None else acc + y
            dwb.append(gk)  # (Fout, Fin) = (Fin_orig, Fout_orig)
        else:
            for b in range(B):
                for fo in range(Fout):
                    s = accs[b * Fout + fo]
                    for fi in range(Fin):
                        c = wk_ref[k, fi, fo] * ctr[b * Fin + fi]
                        s = c if s is None else s + c
                    accs[b * Fout + fo] = s
            rows = []
            for fx in range(Fout):  # x-channel features (Fin_orig)
                cells = []
                for fc in range(Fin):  # recursion features (Fout_orig)
                    s = None
                    for b in range(B):
                        c = (xr[b * Fout + fx] * ctr[b * Fin + fc]).astype(
                            jnp.float32
                        )
                        s = c if s is None else s + c
                    # one (Tr, P) reduction per (fx, fc) cell instead of
                    # one per product: reduce-pass count drops from
                    # K*B*Fin*Fout to K*Fin*Fout (320 -> 80 at the
                    # headline shape); products accumulate elementwise
                    # in f32 first (bitwise-identical sum order per lane)
                    cells.append(jnp.sum(s, keepdims=True))
                rows.append(jnp.concatenate(cells, axis=1))
            dwb.append(jnp.concatenate(rows, axis=0))

    if contract == "dot":
        out_ref[:, 0] = acc.astype(out_ref.dtype)
    else:
        out_ref[:, 0] = jnp.stack(accs, axis=0).astype(out_ref.dtype)

    block = jnp.concatenate(dwb, axis=0).astype(dw_ref.dtype)

    @pl.when(first)
    def _():
        dw_ref[...] = block

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[...] = dw_ref[...] + block


def _resolve_contract_dtype(unroll, iodt=None):
    """(contract strategy, band compute dtype) for a kernel launch.

    In bf16 band mode the AXPY path would either accumulate in bf16 or
    re-promote every product to f32, so ``auto`` routes to the MXU dot
    contraction (native bf16 inputs, f32 accumulation); an explicit
    ``set_contract_mode("axpy")`` still wins for A/B measurements.
    bf16 HBM I/O (``iodt``) implies the bf16 band mode regardless of the
    conv_dtype flag — the window arrives in bf16.
    """
    contract = config.resolve_contract(unroll)
    bdt = config.band_dtype()
    if iodt == jnp.bfloat16:
        bdt = jnp.bfloat16
    if bdt == jnp.bfloat16 and config.contract_mode == "auto":
        contract = "dot"
    return contract, bdt


def reextend_weights(w, n, R0, R1, xp=np):
    """Re-pack wrapped-extended weight planes (T2, F, n+2*R0, P) built with
    window margin R0 into the (T2, F, n+2*R1, P) layout of a wider margin
    R1 (bf16 I/O needs R = roundup(h, 16); the extra margin rows are
    tolerated garbage, stored as zeros)."""
    if R1 == R0:
        return w
    assert R1 > R0
    z = xp.zeros(w.shape[:2] + (R1 - R0, w.shape[3]), dtype=w.dtype)
    return xp.concatenate(
        [w[:, :, 0:n], z, w[:, :, n : n + R0],
         w[:, :, n + R0 : n + 2 * R0], z],
        axis=2,
    )


def _io_weights(st, tables, iodt):
    """The wrapped-extended weight planes in the kernel's I/O dtype.

    f32: the stored table.  bf16 I/O: ``tables["weights_bf16"]`` (built
    once by ``stencil_tables(st, bf16_io=True)`` — R16-extended, bf16);
    when absent, fall back to an in-graph repack + cast (correct but
    re-reads the f32 planes every call — fine for tests, wasteful on the
    hot path)."""
    if iodt != jnp.bfloat16:
        return tables["weights"].astype(jnp.float32)
    w16 = tables.get("weights_bf16")
    if w16 is not None:
        return w16.astype(jnp.bfloat16)
    n, h = st.nside, st.n_steps
    return reextend_weights(
        tables["weights"], n, _round_up(h, 8), _round_up(h, 16), xp=jnp
    ).astype(jnp.bfloat16)


def _strip_arrays(st, xc, faces=None, bands=None):
    """Build the four halo-strip DMA sources from the activation interior.

    Returns top/bot (C, F, R, P_l) row-halo pieces (strip rows positioned
    so a full R-row DMA drops the h real halo rows exactly against the
    face edge, garbage elsewhere) and ls (C, F, n, 128), the two
    lane-halo strips packed into one DMA array (west at lanes [0,h),
    east at [h,2h)).  ``faces``/``bands`` support the face-sharded
    conv: build strips only for ``faces``, sourcing neighbor data from
    the (all-gathered, full-sphere) edge ``bands``.
    """
    from .stencil import edge_strips

    n, h = st.nside, st.n_steps
    _, P_l = cfp_geometry(n, h)
    R = _round_up(h, _sublane(xc.dtype))  # margin matches the kernel's
    C = xc.shape[0]
    f32 = xc.dtype
    west, east, south, north = edge_strips(
        n, h, xc, embedded=True, faces=faces, bands=bands
    )
    F = west.shape[1]

    def zer(*s):
        return jnp.zeros((C, F) + s, f32)

    P0 = n + 2 * h
    wp = jnp.concatenate([west, zer(h, P_l - P0)], axis=3)
    ep = jnp.concatenate([east, zer(h, P_l - P0)], axis=3)
    top = jnp.concatenate([zer(R - h, P_l), wp], axis=2) if R > h else wp
    bot = jnp.concatenate([ep, zer(R - h, P_l)], axis=2) if R > h else ep
    ls = jnp.concatenate([south, north, zer(n, 128 - 2 * h)], axis=3)
    return top, bot, ls


def build_strips(st, xc, interpret=False):
    """Halo-strip arrays for the fused conv, picking the fast builder.

    The single-launch Pallas builder (:mod:`.pallas_strips`) replaces the
    XLA assembly — identical arrays, ~10x cheaper at nside=1024 where the
    XLA formulation is op-launch-bound — whenever the conv itself runs in
    compile mode and the builder covers the config (full sphere, f32
    I/O).  ``config.strips_mode()`` forces either path."""
    from .pallas_strips import build_strips_pallas, strip_builder_available

    mode = config.strips_mode
    if mode != "xla" and strip_builder_available(st, xc):
        if mode == "pallas" or not interpret:
            return build_strips_pallas(st, xc, interpret=interpret)
    return _strip_arrays(st, xc)


def fwd_contract_plan(st, B, Fin, Fout, K, iodt):
    """Resolved execution plan of the forward/dx kernel: the effective
    contraction strategy ('axpy' | 'dot' | 'dots'), band compute dtype,
    and band geometry.  Shared by :func:`_run_stencil_kernel` and
    diagnostics (tools/kbench.py echoes it so a forced ``KB_CONTRACT=dot``
    that silently upgrades to 'dots' — or falls back to axpy — is visible
    in the log, ADVICE r4 #4)."""
    C, Cout = B * Fin, B * Fout
    nplanes = len(st.offsets)
    contract, bdt = _resolve_contract_dtype(B * Fin * Fout * K, iodt)
    geom = _band_geometry(st, C, Cout, bdt=bdt, iodt=iodt)
    if contract == "dot":
        # upgrade to the stacked contraction when the K retained center
        # slices fit on top of the band working set (see _stencil_kernel)
        bb = 2 if bdt == jnp.bfloat16 else 4
        ib = 2 if iodt == jnp.bfloat16 else 4
        radius = getattr(st, "radius", 1) or 1
        budget = _vmem_budget(0 if radius <= 1 else 1)
        n, h, R, P, Tr, Sd = geom
        est = _vmem_est(Tr, R, P, C, Cout, nplanes, 2, bb, ib)
        if est + K * C * Tr * P * bb > budget:
            # retained centers don't fit at the default band: shrink the
            # band with the K retained centers folded into the estimate
            # (plain per-term dot is NOT a safe fallback at large P — at
            # nside=1024 C=16 Mosaic spills 164M of vregs and the compile
            # VMEM-OOMs at 215M/128M, measured on-chip round 4)
            geom = _band_geometry(st, C, Cout, bdt=bdt, iodt=iodt,
                                  extra_band_temps=K)
            n, h, R, P, Tr, Sd = geom
            est = _vmem_est(Tr, R, P, C, Cout, nplanes, 2, bb, ib)
        if est + K * C * Tr * P * bb <= budget:
            contract = "dots"
        else:
            # even the re-derived band cannot hold the retained centers
            # (reachable via _pick_band's estimate-ignoring extreme-pressure
            # fallback): per-term dot is the Mosaic-vreg-spill/compile-OOM
            # class at large P, so fall back to the always-compilable axpy
            # unroll instead of silently keeping 'dot' (ADVICE r4 #2)
            logger.warning(
                "stacked dot contraction does not fit VMEM even at the "
                f"shrunken band (Tr={geom[4]}); falling back to axpy"
            )
            contract = "axpy"
            geom = _band_geometry(st, C, Cout, bdt=bdt, iodt=iodt)
    return contract, bdt, geom


def _run_stencil_kernel(st, kind, n_terms, xc, wext, strips, wk3, B,
                        interpret):
    """pallas_call plumbing for the forward/dx kernel.

    xc: (C, F, n, P_l) (F = 12 faces, or a face shard); wext:
    (9, F, n+2R, P_l) wrapped-extended weight planes; strips:
    (top, bot, ls).  wk3: (K, Fin, Fout).
    Returns (Cout, F, n, P_l) in xc's dtype (f32, or bf16 in I/O mode).
    """
    C = xc.shape[0]
    F = xc.shape[1]
    K, Fin, Fout = wk3.shape
    Cout = B * Fout
    nplanes = len(st.offsets)
    iodt = xc.dtype  # wext/strips match by the callers' contract
    contract, bdt, (n, h, R, P, Tr, Sd) = fwd_contract_plan(
        st, B, Fin, Fout, K, iodt)
    wkT = (jnp.transpose(wk3, (2, 0, 1)).reshape(Fout, K * Fin)
           if contract == "dots"
           else jnp.transpose(wk3, (0, 2, 1)))  # (K, Fout, Fin) for 'dot'

    kernel = partial(_stencil_kernel, kind, K, st.radius, contract, bdt, n,
                     h, R, Tr, Sd, P, C, Cout, B, Fin, Fout)
    return pl.pallas_call(
        kernel,
        grid=(F, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(
            (Cout, 1, Tr, P), lambda f, i: (0, f, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Cout, F, n, P), iodt),
        scratch_shapes=[
            pltpu.VMEM((2, C, Sd, P), iodt),
            pltpu.VMEM((2, nplanes, Sd, P), iodt),
            pltpu.VMEM((2, C, Sd, 128), iodt),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(wk3, wkT, xc, wext, *strips)


def _run_grad_kernel(st, kind, n_terms, xc, wext, strips, dy, B, Fin,
                     interpret):
    """dW (K*Fin, Fout) = per-term scalar contractions of the basis of x
    with dy (both in the conv's native layout)."""
    C = xc.shape[0]
    F = xc.shape[1]
    Cout = dy.shape[0]
    Fout = Cout // B
    K = n_terms
    nplanes = len(st.offsets)
    iodt = xc.dtype
    contract, bdt = _resolve_contract_dtype(B * Fin * Fout * K, iodt)
    # io_blocks=3: on top of the double-buffered (Cout, Tr, P) dy input
    # blocks, _grad_kernel keeps a full interior-MASKED dy copy live across
    # the term stream — one extra Cout-sized buffer the forward does not
    # have.  Measured on-chip (v5e, nside=1024 C=Cout=16): io_blocks=2
    # picks Tr=128 and the compile OOMs VMEM at 131.27M/128M; io_blocks=3
    # drops this kernel (only this one) back to Tr=64, which compiles and
    # runs.  The default fused dx+dW backward is unaffected (io_blocks=4).
    n, h, R, P, Tr, Sd = _band_geometry(st, C, Cout, io_blocks=3,
                                        bdt=bdt, iodt=iodt)

    kernel = partial(_grad_kernel, kind, K, st.radius, contract, bdt, n, h,
                     R, Tr, Sd, P, C, Cout, B, Fin, Fout)
    return pl.pallas_call(
        kernel,
        grid=(F, n // Tr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [
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
            pltpu.VMEM((2, C, Sd, P), iodt),
            pltpu.VMEM((2, nplanes, Sd, P), iodt),
            pltpu.VMEM((2, C, Sd, 128), iodt),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(xc, wext, *strips, dy)


def _run_dxdw_kernel(st, kind, n_terms, dy, wext, strips, wk3t, xr, mask, B,
                     interpret):
    """Fused dx+dW pallas_call (see :func:`_dxdw_kernel`).

    dy: (C, F, n, P) cotangent in the native layout; strips: halo strips
    of dy; wk3t: (K, Fout_orig, Fin_orig) per-term transposed channel
    kernel (the dx pass's wk3); xr: forward input x (Cout, F, n, P),
    NOT pre-masked; mask: (F, n, P) interior/corrupt-row selector
    (``stencil_tables(...)['dw_mask']``) applied in-kernel.  Returns
    (dx (Cout, F, n, P), dwk (K*Fin_orig, Fout_orig)).
    """
    C = dy.shape[0]
    F = dy.shape[1]
    K, Fin, Fout = wk3t.shape  # pass roles: Fin = Fout_orig, Fout = Fin_orig
    Cout = B * Fout
    nplanes = len(st.offsets)
    iodt = dy.dtype
    contract, bdt = _resolve_contract_dtype(B * Fin * Fout * K, iodt)
    wkT = jnp.transpose(wk3t, (0, 2, 1))
    # dot mode: the per-term MXU path keeps a (Cout, Tr*P) masked-dy copy,
    # the dx accumulator, and the per-batch matmul temporaries live across
    # the unrolled term loop; at Tr=64/P=1280 Mosaic spills 102M of vregs
    # and the compile VMEM-OOMs (139M/128M, measured on-chip round 4).
    # Folding ~K extra band temps into the estimate shrinks the band until
    # the unrolled live set fits.  Affected configs: forced-dot A/B runs,
    # large-channel + large-nside corners, AND default bf16 band-mode
    # backwards (auto routes bf16 to 'dot', _resolve_contract_dtype) —
    # though with band_bytes=2 the bf16 estimate shrinks half as fast, and
    # the budget class stays radius-derived (budget_lap_temps, ADVICE r4
    # #1/#3), so radius-1 bf16 runs size against the full 127 MiB envelope.
    n, h, R, P, Tr, Sd = _band_geometry(
        st, C, Cout, io_blocks=4, bdt=bdt, iodt=iodt,
        extra_band_temps=K if contract == "dot" else 0)
    tr_env = os.environ.get("DS_DXDW_TR")
    if tr_env:
        # measurement override (tools/probe_dxdw_tr.py): force the band
        # height past the conservative estimate to probe Mosaic's actual
        # VMEM use — a compile OOM here can fault the worker, so only use
        # from a sacrificial subprocess
        Tr = int(tr_env)
        assert n % Tr == 0 and Tr >= R, (Tr, n, R)
        Sd = Tr + 2 * R

    kernel = partial(_dxdw_kernel, kind, K, st.radius, contract, bdt, n, h,
                     R, Tr, Sd, P, C, Cout, B, Fin, Fout)
    return pl.pallas_call(
        kernel,
        grid=(F, n // Tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 5
        + [
            pl.BlockSpec(
                (Cout, 1, Tr, P), lambda f, i: (0, f, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Tr, P), lambda f, i: (f, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (Cout, 1, Tr, P), lambda f, i: (0, f, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K * Fout, Fin), lambda f, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Cout, F, n, P), iodt),
            jax.ShapeDtypeStruct((K * Fout, Fin), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, Sd, P), iodt),
            pltpu.VMEM((2, nplanes, Sd, P), iodt),
            pltpu.VMEM((2, C, Sd, 128), iodt),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(wk3t, wkT, dy, wext, *strips, xr, mask)


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


def _simple_corr(st, tables, unroll, iodt):
    """Whether this conv's corrections should use the ONE-gather /
    ONE-scatter flat forms instead of the per-corner patch chains.

    The patch chains (48+ static-slice ops each) are the right trade for
    the axpy-mode hot path (a flat gather/scatter makes XLA relayout or
    copy the full map, ~2.8/15 ms at nside=1024), but at dot-mode channel
    counts the accumulated program complexity crossed an XLA cliff that
    hard-faults the TPU worker (round-5 bisection, probe_qs_train.py) —
    and at the model scales where dot mode engages, full-map copies cost
    tens of microseconds."""
    contract, _ = _resolve_contract_dtype(unroll, iodt)
    return contract == "dot" and tables.get("corr_rows_cfp") is not None


def _gather_rows_flat(arr, rows):
    """(C, 12, n, P_l) at flat cfp row indices ``rows`` -> (len(rows), C)
    via a single gather."""
    C = arr.shape[0]
    return jnp.transpose(jnp.take(arr.reshape(C, -1), rows, axis=1))


def _ball_terms(st, tables, xc, n_terms, kind, simple=False):
    """Exact per-term basis values over the correction ball.

    xc: (C, 12, n, P_l) native layout.  The ball is O(100) rows read via
    small per-corner patch slices — a full-map gather makes XLA relayout
    the whole activation (~2.8 ms at nside=1024) just to serve it —
    unless ``simple`` (see :func:`_simple_corr`), which reads them with
    one flat gather instead.  Yields (Bn, C) per term.
    """
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    Bn = int(np.asarray(st.corr_src).shape[0])
    if simple:
        t = _gather_rows_flat(xc, tables["corr_src_cfp"])
    else:
        t = _gather_rows(st, xc, _ball_patches(st), Bn)
    t = t.astype(jnp.float32)  # (Bn, C)
    yield t
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = _ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        yield tk
        prev2, prev1 = prev1, tk


def _corrected_rows(st, tables, xc, wk3, n_terms, kind, B, simple=False):
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
    for k, tk in enumerate(_ball_terms(st, tables, xc, n_terms, kind,
                                       simple=simple)):
        d = term_dot(tk[out_rows], k)
        acc = d if acc is None else acc + d
    return acc


def _basis_at_rows(st, tables, xc, n_terms, kind, simple=False):
    """Exact per-term basis values at the corrupt rows: (K, Rc, C)."""
    out_rows = tables["corr_out_ball"]
    return jnp.stack(
        [tk[out_rows] for tk in _ball_terms(st, tables, xc, n_terms, kind,
                                            simple=simple)],
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
    return _group_patches(st, "corr_out_face", "_corr_patch_cache")


def _ball_patches(st):
    """Static patch metadata for reading the ball's source rows (the
    O(100) pixels feeding the exact corner recursion)."""
    return _group_patches(st, "corr_src", "_ball_patch_cache")


def _group_patches(st, ids_attr, cache_attr):
    if getattr(st, cache_attr, None) is None:
        n = st.nside
        ids = np.asarray(getattr(st, ids_attr, []), dtype=np.int64)
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
        setattr(st, cache_attr, patches)
    return getattr(st, cache_attr)


def _gather_rows(st, arr, patches, count):
    """Values of ``arr`` (C*, 12, n, P_l) at the patch-selected rows:
    (count, C*) — small patch reads, no full-map gather."""
    h = st.n_steps
    out = jnp.zeros((count, arr.shape[0]), arr.dtype)
    for face, x0, y0, sel in patches:
        rx, ry = sel.shape
        l0 = y0 + h
        patch = arr[:, face, x0 : x0 + rx, l0 : l0 + ry].reshape(
            arr.shape[0], rx * ry
        )
        m = sel.reshape(-1) >= 0
        out = out.at[jnp.asarray(sel.reshape(-1)[m])].set(
            jnp.transpose(patch[:, jnp.asarray(np.nonzero(m)[0])])
        )
    return out


def _patch_corrections(st, y, y_fix, rows=None):
    """Overwrite the corrupt rows of y (Cout, 12, n, P_l) with the exact
    values ``y_fix`` (Rc, Cout), via per-corner static-slice updates —
    or, when ``rows`` (flat cfp indices, ``tables['corr_rows_cfp']``) is
    given, via ONE scatter (see :func:`_simple_corr`)."""
    if rows is not None:
        C = y.shape[0]
        shp = y.shape
        yf = y.reshape(C, -1).at[:, rows].set(
            jnp.transpose(y_fix).astype(y.dtype))
        return yf.reshape(shp)
    h = st.n_steps
    yt = jnp.transpose(y_fix)  # (Cout, Rc)
    for face, x0, y0, sel in _corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        l0 = y0 + h
        patch = y[:, face, x0 : x0 + rx, l0 : l0 + ry]
        vals = yt[:, jnp.clip(selj, 0)]  # (Cout, rx, ry), tiny gather
        patch = jnp.where(selj[None] >= 0, vals, patch)
        y = y.at[:, face, x0 : x0 + rx, l0 : l0 + ry].set(
            patch.astype(y.dtype)
        )
    return y


def _dw_mask_graph(st, dtype, tables=None):
    """(12, n, P_l) selector for the fused dx+dW kernel's x stream: 1 on
    interior lanes, 0 on halo/pad lanes AND on the corrupt corner rows.
    Built in-graph per backward call (one 56 MB broadcast at nside=1024,
    ~0.1 ms) — applying it INSIDE the kernel replaced the
    ``_zero_corrections`` pass on the full x array, whose first
    ``.at[].set`` on a jit input forced a whole-map copy.  The corrupt
    rows come from the host-precomputed ``tables['corr_mask']`` plane
    when available (ONE multiply; the per-corner DUS-chain fallback
    contributed to the XLA compile-complexity cliff — see
    ``_zero_corrections``)."""
    n, h = st.nside, st.n_steps
    _, P = cfp_geometry(n, h)
    lane = jnp.arange(P)
    row = ((lane >= h) & (lane < h + n)).astype(dtype)
    m = jnp.broadcast_to(row[None, None, :], (12, n, P))
    if not int(np.asarray(st.corr_src).shape[0]):
        return m
    cm = tables.get("corr_mask") if tables is not None else None
    if cm is not None:
        return m * cm.astype(dtype)
    for face, x0, y0, sel in _corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        l0 = y0 + h
        patch = m[face, x0 : x0 + rx, l0 : l0 + ry]
        patch = jnp.where(selj >= 0, jnp.zeros_like(patch), patch)
        m = m.at[face, x0 : x0 + rx, l0 : l0 + ry].set(patch)
    return m


def _zero_corrections(st, dy, tables=None):
    """Zero the corrupt rows of dy (Cout, 12, n, P_l).

    With ``tables['corr_mask']`` (host-precomputed (12, n, P_l) plane):
    ONE broadcast multiply.  The per-corner DUS-chain fallback remains for
    hand-built table dicts, but the mask is strongly preferred — the DUS
    chain contributed to an XLA compile-complexity cliff that hard-faults
    the TPU worker in big backward programs (round-5 bisection)."""
    cm = tables.get("corr_mask") if tables is not None else None
    if cm is not None:
        return dy * cm.astype(dy.dtype)
    h = st.n_steps
    for face, x0, y0, sel in _corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        l0 = y0 + h
        patch = dy[:, face, x0 : x0 + rx, l0 : l0 + ry]
        patch = jnp.where(selj[None] >= 0, jnp.zeros_like(patch), patch)
        dy = dy.at[:, face, x0 : x0 + rx, l0 : l0 + ry].set(patch)
    return dy


def _gather_corrections(st, dy, tables=None, simple=False):
    """dy values at the corrupt rows, (Rc, Cout) — small patch reads (no
    full-map gather), or one flat gather under ``simple``."""
    if simple:
        return _gather_rows_flat(dy, tables["corr_rows_cfp"])
    Rc = int(np.asarray(st.corr_out_face).shape[0])
    return _gather_rows(st, dy, _corr_patches(st), Rc)


def _xla_bwd(st, tables, dy, xcf, kernel_t, n_terms, kind, B, Fin, Fout):
    """Backward pass of the fused conv on the per-step XLA stencil path.

    dx is the adjoint conv of dy (L~ is symmetric, so the same patched
    operator with the transposed channel kernel — the round-3-verified
    per-step path); dW contracts the per-step basis terms of x against
    dy.  Used for deep-halo (h > 8) compiled backwards, where the Pallas
    backward kernels hard-fault the TPU worker (round-5 isolation); the
    fused forward stays on the chip-validated Pallas kernel.

    dy/xcf: (B*Fout / B*Fin, 12, n, P_l) cfp layout.  Returns
    (dx (B*Fin, 12, n, P_l) f32, dwk (K, Fin, Fout) f32).
    """
    from .stencil import stencil_graph_conv, stencil_matvec
    from .stencil import _term_stream as _xla_terms

    n, h = st.nside, st.n_steps
    M = 12 * n * n
    P_l = dy.shape[3]
    dyi = dy[:, :, :, h : h + n].astype(jnp.float32)
    dy_bmf = jnp.transpose(
        dyi.reshape(B, Fout, M), (0, 2, 1))  # (B, M, Fout)
    dx_bmf = stencil_graph_conv(
        st, dy_bmf, kernel_t.astype(jnp.float32), n_terms, kind,
        tables=tables, layout="face", fused="never",
    )  # (B, M, Fin)
    dxi = jnp.transpose(dx_bmf, (0, 2, 1)).reshape(B * Fin, 12, n, n)
    dx = jnp.concatenate(
        [
            jnp.zeros((B * Fin, 12, n, h), dxi.dtype),
            dxi,
            jnp.zeros((B * Fin, 12, n, P_l - n - h), dxi.dtype),
        ],
        axis=3,
    )

    xfi = jnp.transpose(
        xcf[:, :, :, h : h + n].astype(jnp.float32).reshape(
            B, Fin, 12, n, n),
        (2, 3, 4, 0, 1),
    ).reshape(12, n, n, B * Fin)
    matvec = lambda t: stencil_matvec(st, tables, t)
    dy_mbo = jnp.transpose(dy_bmf, (1, 0, 2))  # (M, B, Fout)
    dwk = jnp.stack(
        [
            jnp.einsum(
                "mbf,mbo->fo",
                t.reshape(M, B, Fin),
                dy_mbo,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for t in _xla_terms(kind, matvec, xfi, n_terms)
        ],
        axis=0,
    )  # (K, Fin, Fout)
    return dx, dwk


# ---------------------------------------------------------------------------
# top level with custom VJP
# ---------------------------------------------------------------------------


def _io_dtype(st):
    """The HBM I/O dtype this conv runs with: bf16 when the config asks
    for it AND the geometry satisfies the 16-aligned DMA constraints."""
    iodt = config.conv_io_dtype()
    if iodt == jnp.bfloat16 and not cfp_io_available(st):
        return jnp.float32
    return iodt


def _forward_cfp(st, kind, n_terms, B, interpret, tables, xc, kernel,
                 strips=None):
    """xc: (C, 12, n, P_l) native layout (C = B*Fin, b-major) ->
    (Cout, 12, n, P_l) in the conv's I/O dtype (f32, or bf16 in
    ``bfloat16_io`` mode).  Halo lanes of xc may be stale garbage — strips
    are rebuilt from the interior every call unless the caller passes
    precomputed ``strips`` of this exact xc (the VJP shares the forward's
    strips with the dW pass; strip assembly is several ms at nside=1024)."""
    C = xc.shape[0]
    Fin = C // B
    Fout = kernel.shape[-1]
    iodt = _io_dtype(st)

    wk3 = jnp.transpose(
        kernel.astype(jnp.float32).reshape(Fin, n_terms, Fout), (1, 0, 2)
    )  # (K, Fin, Fout)
    xc = xc.astype(iodt)
    if strips is None:
        strips = build_strips(st, xc, interpret)
    wext = _io_weights(st, tables, iodt)  # (9, 12, n+2R, P_l)
    y = _run_stencil_kernel(st, kind, n_terms, xc, wext, strips, wk3, B,
                            interpret)
    if tables["corr_src"].shape[0]:
        simple = _simple_corr(st, tables, B * Fin * Fout * n_terms, iodt)
        y_fix = _corrected_rows(st, tables, xc, wk3, n_terms, kind, B,
                                simple=simple)
        y = _patch_corrections(
            st, y, y_fix,
            rows=tables["corr_rows_cfp"] if simple else None)
    return y


def fused_stencil_conv_cfp(st: FaceStencil, tables, xc, kernel, n_terms,
                           kind, B, interpret=False):
    """Fused K-term polynomial graph conv in its native padded layout.

    This is the zero-permutation hot path: input and output share the
    layout (C, 12, n, P_l) (face col y at lane y + h), so a chain of convs
    runs with no transposes and no halo-materialization passes at all —
    cross-face halos are assembled in VMEM per band from three small strip
    arrays.

    :param st: FaceStencil built with ``n_steps = n_terms - 1``
    :param tables: device arrays (``stencil_tables(st)`` + correction arrays)
    :param xc: (B*Fin, 12, n, P_l) activations, batch-major channels;
        only the interior (lanes [h, h+n)) is read
    :param kernel: (Fin*n_terms, Fout)
    :param B: static batch size (the channel packing)
    :return: (B*Fout, 12, n, P_l) in the conv I/O dtype (float32, or
        bfloat16 under ``config.conv_dtype == "bfloat16_io"`` — reduce in
        f32 on the caller side); lanes outside the interior are garbage
    """

    @partial(jax.custom_vjp, nondiff_argnums=())
    def conv(tables, xc, kernel):
        return _forward_cfp(st, kind, n_terms, B, interpret, tables, xc,
                            kernel)

    in_dtype = xc.dtype  # static: bwd returns dx in the primal input dtype

    def fwd(tables, xc, kernel):
        xcf = xc.astype(_io_dtype(st))
        strips = build_strips(st, xcf, interpret)
        y = _forward_cfp(st, kind, n_terms, B, interpret, tables, xcf,
                         kernel, strips=strips)
        # the fused dx+dW backward rebuilds its strips from dy and never
        # reads these — keep them out of the residuals so they cannot be
        # held live across the backward (~100+ MB at nside=1024 under
        # jax.checkpoint / separate fwd-bwd compilation)
        return y, (tables, xcf, None if config.fused_dw else strips, kernel)

    def bwd(res, dy):
        tables, xcf, strips, kernel = res
        iodt = xcf.dtype
        C = xcf.shape[0]
        Fin = C // B
        Fout = kernel.shape[-1]
        dy = dy.astype(iodt)

        # dx: the patched forward computes the EXACT symmetric operator
        # y = sum_k T_k(L~) x W_k at every output row (corner rows via the
        # ball), so its adjoint is the same patched conv with the
        # transposed channel kernel applied to the full dy.  dy's halo
        # lanes are garbage by the layout contract (downstream consumers
        # only read the interior), and the conv ignores them.
        kernel_t = (
            kernel.reshape(Fin, n_terms, Fout)
            .transpose(2, 1, 0)
            .reshape(Fout * n_terms, Fin)
        )
        has_corr = bool(tables["corr_src"].shape[0])
        if os.environ.get("DS_SKIP_CORR") == "1":
            # measurement-only bisection hook (tools/probe_dxdw_tr.py):
            # quantifies what the corner-correction passes cost the
            # backward.  NUMERICALLY WRONG at corner rows — never set in
            # production.
            has_corr = False
        wext = _io_weights(st, tables, iodt)

        # The fused dx+dW kernel doubles the per-term MXU dot count of the
        # forward (dx AND dW dots per batch, K-unrolled) and keeps the
        # masked-x operand live across the whole unrolled stream; at
        # dot-mode channel counts (B*Fin*Fout*K > contract_dot_min_unroll,
        # e.g. the quick_start widths: 16*5*5*10 = 4000) Mosaic spills and
        # the compile hard-faults the TPU worker (round-5 finding: the
        # quick-start TRAIN step crashed the worker in every bench
        # rehearsal while its forward compiled fine).  Route dot-mode
        # backwards through the two-kernel path: dx is literally the
        # forward program on dy (known-compiling), dW is the standalone
        # kernel whose dot form compiles after its band shrink.
        contract_bwd, _ = _resolve_contract_dtype(
            B * Fin * Fout * n_terms, iodt)
        simple = _simple_corr(st, tables, B * Fin * Fout * n_terms, iodt)
        corr_rows = tables["corr_rows_cfp"] if simple else None
        if not interpret and st.n_steps > 8:
            # deep-halo (h > 8, i.e. K >= 9 radius-1) COMPILED backwards
            # run the per-step XLA path: the fused FORWARD at padded
            # h=16 is chip-validated (round 4, stage 8), but its fused
            # backward hard-faults the worker at the quick_start train
            # shape (round-5 isolation: the model stage trains clean
            # all-XLA at 107 maps/s, faults the moment this conv's
            # pallas backward joins the program).
            dx, dwk = _xla_bwd(st, tables, dy, xcf, kernel_t, n_terms,
                               kind, B, Fin, Fout)
            dx = dx.astype(in_dtype)
        elif config.fused_dw and contract_bwd != "dot":
            # one band pass over dy computes BOTH dx and the face-exact
            # part of dW (adjoint trick — see _dxdw_kernel); corner rows
            # are handled outside: dx via the exact ball patch, dW by
            # zeroing x at corrupt rows in the kernel contraction and
            # adding the exact <x[corrupt], T_k(L~)dy[corrupt]> terms.
            wk3t = jnp.transpose(
                kernel_t.astype(jnp.float32).reshape(Fout, n_terms, Fin),
                (1, 0, 2),
            )  # (K, Fout_orig, Fin_orig)
            dyf = dy
            dy_strips = build_strips(st, dyf, interpret)
            # interior + corrupt-row selection happens IN the kernel via
            # the mask plane (see _dw_mask_graph)
            mask = _dw_mask_graph(st, iodt, tables)
            dx, dwk2 = _run_dxdw_kernel(
                st, kind, n_terms, dyf, wext, dy_strips, wk3t, xcf, mask,
                B, interpret,
            )
            if has_corr:
                dx_fix = _corrected_rows(st, tables, dyf, wk3t, n_terms,
                                         kind, B, simple=simple)
                dx = _patch_corrections(st, dx, dx_fix, rows=corr_rows)
            dx = dx.astype(in_dtype)
            dwk = dwk2.reshape(n_terms, Fin, Fout)
            if has_corr:
                tdy = _basis_at_rows(st, tables, dyf, n_terms, kind,
                                     simple=simple)
                x_rc = _gather_corrections(st, xcf, tables, simple=simple)
                dwk = dwk + jnp.einsum(
                    "rbf,krbo->kfo",
                    x_rc.reshape(-1, B, Fin),
                    tdy.reshape(n_terms, -1, B, Fout),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        else:
            dx = _forward_cfp(st, kind, n_terms, B, interpret, tables, dy,
                              kernel_t)
            dx = dx.astype(in_dtype)
            dy_clean = (_zero_corrections(st, dy, tables) if has_corr
                        else dy)
            if strips is None:  # fused_dw toggled between fwd/bwd traces
                strips = build_strips(st, xcf, interpret)

            # dW: per-term scalar contractions over the same band windows;
            # strips come from the forward residuals (same xc)
            dwk = _run_grad_kernel(
                st, kind, n_terms, xcf, wext, strips, dy_clean, B, Fin,
                interpret,
            ).reshape(n_terms, Fin, Fout)
            if has_corr:
                basis = _basis_at_rows(st, tables, xcf, n_terms, kind,
                                       simple=simple)
                dy_rc = _gather_corrections(st, dy, tables, simple=simple)
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
    return conv(tables, xc, kernel)


def fused_stencil_conv_cf(st: FaceStencil, tables, x3, kernel, n_terms, kind,
                          B, interpret=False):
    """Fused conv on (C, 12, n, n) channels-first face images — embeds into
    the native padded layout, runs the conv, and slices the interior back
    out (one lane-pad copy each way; chains should use
    :func:`fused_stencil_conv_cfp` directly)."""
    n, h = st.nside, st.n_steps
    _, P_l = cfp_geometry(n, h)
    C = x3.shape[0]
    xc = jnp.concatenate(
        [
            jnp.zeros((C, 12, n, h), x3.dtype),
            x3,
            jnp.zeros((C, 12, n, P_l - n - h), x3.dtype),
        ],
        axis=3,
    )
    y = fused_stencil_conv_cfp(
        st, tables, xc, kernel, n_terms, kind, B, interpret=interpret
    )
    return y[:, :, :, h : h + n]


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
