"""Single-launch Pallas builder for the fused conv's halo-strip arrays.

The XLA formulation of the strip assembly (:func:`.stencil.edge_strips`
via :func:`.pallas_stencil._strip_arrays`) lowers to ~300 tiny
slice/flip/transpose/concat ops; at nside=1024 that costs ~5.3 ms/conv —
a third of the whole conv step — purely in per-op launch overhead (the
data itself is ~25 MB).  This module rebuilds the *same arrays bit for
bit* in ONE Pallas launch: a static unroll over the 12 faces where each
halo block is a DMA load of the neighbor-face edge rectangle plus a
handful of in-register transforms.

Mosaic constraints that shaped the design (probed on-chip, see
tools/probe_strips.py):

- ``lax.rev`` (flip) does not lower; long-axis flips run as chunked
  anti-identity matmuls on the MXU (permutation matmul at HIGHEST
  precision is numerically EXACT: every output is 1.0 * x + 0s, and the
  bf16x3 f32 path reconstructs x exactly), short-axis flips as
  slice-reverse concats.
- DMA descriptors cannot lane-slice at non-128-aligned offsets; loads
  pull aligned 128-lane windows (or the full padded width) and slice in
  VMEM.
- ``jnp.swapaxes(-1, -2)`` of thin blocks lowers fine and handles the
  transposed neighbor orientations.

Layout parity is with :func:`.pallas_stencil._strip_arrays` (reference
semantics: the halo refresh of the stored-CSR conv at
/root/reference/src/deepsphere/gnn_layers.py:137-143, reformulated as
face-edge band copies): ``top``/``bot`` (C, 12, R, P) row-halo strips
with the h real rows against the face edge, ``ls`` (C, 12, n, 128) with
the west lane strip packed at lanes [0, h) and east at [h, 2h).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sphere.faces import edge_descriptor

__all__ = ["strip_builder_available", "build_strips_pallas"]

# above this halo depth the slice-reverse flip unrolls too far; such
# stencils (none today: h = radius * (K-1) tops out well below) fall
# back to the XLA strip assembly
_MAX_H = 32

# VMEM working-set budget for one double-buffer slot pair; the channel
# chunk Cb is the largest divisor of C that fits
_VMEM_BUDGET = 100 * 2**20


def _round_up(x, m):
    return -(-x // m) * m


def _rng(n, w0, length, flip):
    return (n - w0 - length, n - w0) if flip else (w0, w0 + length)


def _plan_face(n, h, f, P, Rr):
    """Static load/block plan for one face.

    Returns (loads, blocks): ``loads`` is a list of
    (kind, nbf, row0, nrows, lane0, nlanes) DMA descriptors into the
    embedded activation (C, 12, n, P); ``blocks`` describe the VMEM
    transform of each halo block (in-buffer slices, swap/flip flags,
    destination strip and offsets).  Mirrors
    :func:`.stencil.edge_strips` / ``_edge_block`` exactly.
    """
    loads = []
    load_key = {}
    blocks = []

    def get_load(kind, nbf, row0, nrows, lane0, nlanes):
        key = (kind, nbf, row0, lane0)
        if key not in load_key:
            load_key[key] = len([l for l in loads if l[0] == kind])
            loads.append((kind, nbf, row0, nrows, lane0, nlanes))
        return load_key[key]

    def add(dest, xs, ys, out_l0):
        lx = h if xs else n
        ly = h if ys else n
        d = edge_descriptor(f, xs, ys)
        if d is None:
            return  # polar 3-way corner: stays zero
        nbf, fx, fy, swap = d
        xw0 = n - h if xs < 0 else 0
        yw0 = n - h if ys < 0 else 0
        ax = _rng(n, xw0, lx, fx)
        ay = _rng(n, yw0, ly, fy)
        (a0, a1), (b0, b1) = ((ay, ax) if swap else (ax, ay))
        rows_thin = (a1 - a0) == h and (a0 == 0 or a0 == n - h)
        if rows_thin:
            w0 = 0 if a0 == 0 else n - Rr
            lw0 = min((h + b0) // 128 * 128, P - 128)
            if h + b1 - lw0 <= 128:  # fits one aligned lane window
                kind, nlanes = "cnr", 128
            else:  # full padded width
                kind, lw0, nlanes = "row", 0, P
            li = get_load(kind, nbf, w0, Rr, lw0, nlanes)
            r_in = (a0 - w0, a1 - w0)
            l_in = (h + b0 - lw0, h + b1 - lw0)
        else:
            assert (a0, a1) == (0, n), "col rects span all face rows"
            lw0 = min((h + b0) // 128 * 128, P - 128)
            assert h + b1 - lw0 <= 128, "col rect exceeds one lane window"
            kind = "col"
            li = get_load(kind, nbf, 0, n, lw0, 128)
            r_in = (0, n)
            l_in = (h + b0 - lw0, h + b1 - lw0)
        blocks.append(
            dict(kind=kind, li=li, r_in=r_in, l_in=l_in, swap=swap,
                 fx=fx, fy=fy, dest=dest, out_l0=out_l0, lx=lx, ly=ly)
        )

    add("top", -1, -1, 0)
    add("top", -1, 0, h)
    add("top", -1, 1, h + n)
    add("bot", 1, -1, 0)
    add("bot", 1, 0, h)
    add("bot", 1, 1, h + n)
    add("ls", 0, -1, 0)   # south -> packed lanes [0, h)
    add("ls", 0, 1, h)    # north -> packed lanes [h, 2h)
    return loads, blocks


def _plan(n, h, P, Rr):
    plan = [_plan_face(n, h, f, P, Rr) for f in range(12)]
    counts = {k: 0 for k in ("col", "row", "cnr")}
    for loads, _ in plan:
        for k in counts:
            counts[k] = max(counts[k], sum(1 for l in loads if l[0] == k))
    return plan, counts


def _flip_axis(v, axis, jr):
    """Exact flip along ``axis`` of a VMEM-resident block.

    Short axes (<= _MAX_H) reverse by static slice concat; long lane
    axes by chunked anti-identity matmul (exact, see module docstring);
    long sublane axes via transpose -> lane flip -> transpose.
    """
    axis = axis % v.ndim
    L = v.shape[axis]
    if L == 1:
        return v
    if L <= _MAX_H:
        idx = [slice(None)] * v.ndim
        parts = []
        for i in reversed(range(L)):
            ix = list(idx)
            ix[axis] = slice(i, i + 1)
            parts.append(v[tuple(ix)])
        return jnp.concatenate(parts, axis=axis)
    if axis == v.ndim - 2:
        return jnp.swapaxes(
            _flip_axis(jnp.swapaxes(v, -1, -2), -1, jr), -1, -2
        )
    assert axis == v.ndim - 1
    cs = jr.shape[0]
    assert L % cs == 0, (L, cs)
    lead = v.shape[:-1]
    v2 = v.reshape(int(np.prod(lead)), L)
    parts = []
    for j in reversed(range(L // cs)):
        parts.append(
            jax.lax.dot(
                v2[:, j * cs : (j + 1) * cs], jr,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        )
    return jnp.concatenate(parts, axis=-1).reshape(*lead, L)


def _builder_kernel(n, h, R, Rr, P, Cb, plan, nsl, skip,
                    jr_ref, xc_ref, top_ref, bot_ref, ls_ref,
                    colb, rowb, cnrb, tb, bb, lsb, lsem, osem):
    """One grid step = one Cb-channel slab, statically unrolled over the
    12 faces with double-buffered face-strip outputs."""
    ci = pl.program_id(0)
    nc = pl.num_programs(0)
    c0 = pl.multiple_of(ci * Cb, Cb)
    jr = jr_ref[...]
    bufs = {"col": colb, "row": rowb, "cnr": cnrb}

    def out_copies(fi, slot):
        return [
            pltpu.make_async_copy(
                tb.at[slot], top_ref.at[pl.ds(c0, Cb), fi], osem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                bb.at[slot], bot_ref.at[pl.ds(c0, Cb), fi], osem.at[slot, 1]
            ),
            pltpu.make_async_copy(
                lsb.at[slot], ls_ref.at[pl.ds(c0, Cb), fi], osem.at[slot, 2]
            ),
        ]

    for fi, (loads, blocks) in enumerate(plan):
        slot = fi % 2

        # issue this face's loads (hardware overlaps the transfers)
        per_kind = {"col": 0, "row": 0, "cnr": 0}
        copies = []
        for kind, nbf, row0, nrows, lane0, nlanes in (
            [] if "loads" in skip else loads
        ):
            bi = per_kind[kind]
            per_kind[kind] += 1
            buf = bufs[kind]
            si = {"col": 0, "row": nsl["col"],
                  "cnr": nsl["col"] + nsl["row"]}[kind] + bi
            copies.append(
                pltpu.make_async_copy(
                    xc_ref.at[
                        pl.ds(c0, Cb), nbf,
                        pl.ds(row0, nrows), pl.ds(lane0, nlanes),
                    ],
                    buf.at[slot, bi],
                    lsem.at[slot, si],
                )
            )
        for c in copies:
            c.start()

        # drain the out-DMAs that used this slot two faces ago (shape-
        # identical descriptors; cross-step waits land at fi in {0, 1})
        if fi >= 2:
            for c in out_copies(fi - 2, slot):
                c.wait()
        else:
            @pl.when(ci > 0)
            def _(fi=fi, slot=slot):
                for c in out_copies(10 + fi, slot):
                    c.wait()

        # face buffers start zeroed (polar-corner gaps and lane padding);
        # lsb lanes [2h, 128) stay zero across all faces and grid steps
        tb[slot, :, :, :] = jnp.zeros((Cb, R, P), tb.dtype)
        bb[slot, :, :, :] = jnp.zeros((Cb, R, P), bb.dtype)
        if fi < 2:
            lsb[slot, :, :, :] = jnp.zeros((Cb, n, 128), lsb.dtype)

        for c in copies:
            c.wait()

        for blk in [] if "blocks" in skip else blocks:
            buf = bufs[blk["kind"]]
            (r0, r1), (l0, l1) = blk["r_in"], blk["l_in"]
            v = buf[slot, blk["li"], :, r0:r1, l0:l1]
            if blk["swap"]:
                v = jnp.swapaxes(v, -1, -2)
            if blk["fx"]:
                v = _flip_axis(v, -2, jr)
            if blk["fy"]:
                v = _flip_axis(v, -1, jr)
            ol = blk["out_l0"]
            if blk["dest"] == "top":
                tb[slot, :, R - h : R, ol : ol + blk["ly"]] = v
            elif blk["dest"] == "bot":
                bb[slot, :, 0:h, ol : ol + blk["ly"]] = v
            else:
                lsb[slot, :, :, ol : ol + h] = v

        for c in out_copies(fi, slot):
            c.start()

        if fi == 11:
            @pl.when(ci == nc - 1)
            def _():
                for c in out_copies(10, 0) + out_copies(11, 1):
                    c.wait()


def _pick_cb(C, n, P, Rr, nsl, itemsize):
    per_c = (
        nsl["col"] * n * 128
        + nsl["row"] * Rr * P
        + nsl["cnr"] * Rr * 128
        + 2 * Rr * P  # tb + bb rows are R <= Rr
        + n * 128  # lsb
    ) * 2 * itemsize  # double-buffered
    cb = max(1, min(C, _VMEM_BUDGET // max(per_c, 1)))
    while C % cb:
        cb -= 1
    return cb


def strip_builder_available(st, xc, faces=None, bands=None):
    """Whether the single-launch builder covers this conv's strips."""
    n, h = st.nside, st.n_steps
    return (
        faces is None
        and bands is None
        and xc.dtype == jnp.float32
        and xc.ndim == 4
        and xc.shape[1] == 12
        and h <= _MAX_H
        and 2 * h <= 128
        and n >= 8
        and n % min(n, 128) == 0
        and n >= _round_up(h, 8)
    )


def build_strips_pallas(st, xc, interpret=False, _debug_skip=()):
    """The (top, bot, ls) strip arrays of ``_strip_arrays``, built in one
    Pallas launch.  xc: (C, 12, n, P_l) embedded activations, f32.

    ``_debug_skip`` ("loads"/"blocks") disables kernel stages for cost
    bisection (tools/check_strips_tpu.py only — output is garbage)."""
    from .pallas_stencil import _round_up as ru, _sublane, cfp_geometry

    n, h = st.nside, st.n_steps
    R, P = cfp_geometry(n, h)
    R = ru(h, _sublane(xc.dtype))
    Rr = ru(h, 8)
    C = xc.shape[0]
    assert xc.shape[3] == P, (xc.shape, P)
    plan, nsl = _plan(n, h, P, Rr)
    cs = min(n, 128)
    jr = np.zeros((cs, cs), np.float32)
    jr[np.arange(cs), cs - 1 - np.arange(cs)] = 1.0
    Cb = _pick_cb(C, n, P, Rr, nsl, xc.dtype.itemsize)
    nsem = nsl["col"] + nsl["row"] + nsl["cnr"]

    kernel = partial(_builder_kernel, n, h, R, Rr, P, Cb, plan, nsl,
                     tuple(_debug_skip))
    return pl.pallas_call(
        kernel,
        grid=(C // Cb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(3)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, 12, R, P), xc.dtype),
            jax.ShapeDtypeStruct((C, 12, R, P), xc.dtype),
            jax.ShapeDtypeStruct((C, 12, n, 128), xc.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, max(nsl["col"], 1), Cb, n, 128), xc.dtype),
            pltpu.VMEM((2, max(nsl["row"], 1), Cb, Rr, P), xc.dtype),
            pltpu.VMEM((2, max(nsl["cnr"], 1), Cb, Rr, 128), xc.dtype),
            pltpu.VMEM((2, Cb, R, P), xc.dtype),
            pltpu.VMEM((2, Cb, R, P), xc.dtype),
            pltpu.VMEM((2, Cb, n, 128), xc.dtype),
            pltpu.SemaphoreType.DMA((2, nsem)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        interpret=interpret,
    )(jr, xc)
