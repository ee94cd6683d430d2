"""Face-sharded fused stencil conv: tensor parallelism for the hot op.

The conv's native layout (C, 12, n, P_l) shards naturally on the FACE axis
(12 = 2·2·3 → 2, 3, 4, 6 or 12 shards): each device runs the fused Pallas
kernel (:mod:`..ops.pallas_stencil`) over its local faces, and the only
communication is an ``all_gather`` of the four face-edge bands — O(h·n)
per face, ~26 MB total at nside=1024 vs the 0.9 GB activation — from
which every device builds its local halo strips as structured edge copies.
This is the framework's analogue of sequence parallelism for the pixel
axis (SURVEY.md §2.3), riding ICI with one small collective per conv.

Batch parallelism composes on a second mesh axis for free: the layout
packs batch into the channel dim b-major, so sharding C by whole batch
blocks keeps every device's channel packing self-contained.

Corner corrections (the 8 polar 3-way corners the rectangular face
extension cannot represent — see :mod:`..graph.stencil`) need O(100)
pixels that may live on remote faces: four D×D corner boxes per face are
all-gathered alongside the bands (D = min(n, 4h), a few hundred KB), the
exact ball recursion runs replicated, and each device patches only its
local faces via guarded dynamic updates.

Used via ``shard_map`` with the face axis bound to a mesh axis; see
``tests/test_sharding.py`` for the canonical wiring.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.stencil import FaceStencil
from ..ops import pallas_stencil as ps
from ..ops.stencil import edge_strips, extract_edge_bands

__all__ = ["face_sharded_cfp_conv", "cface_model_conv", "corner_box_depth"]


def cface_model_conv(st, tables, x5, kernel, n_terms, kind, cfg):
    """Model-level entry of the face-sharded fused conv on GLOBAL arrays.

    This is what the model assembler wires in when a conv runs in the
    cface layout under a :class:`~.sharded_ops.ShardConfig`: the 5D
    activation (B, Fin, 12, n, P_l) has batch on the ``data`` mesh axis
    and faces on the ``pixel`` mesh axis; the conv itself runs inside
    ``shard_map`` via :func:`face_sharded_cfp_conv` (fused Pallas kernel
    per shard; the only communication is the edge-band / corner-box
    all_gather).  Everything around it (BN, pools, pseudo-convs) stays in
    global-array land where the XLA SPMD partitioner places the
    collectives.

    :param x5: (B, Fin, 12, n, P_l) global cface activations
    :return: (B, Fout, 12, n, P_l)
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .. import config

    B, Fin = int(x5.shape[0]), int(x5.shape[1])
    n, P_l = int(x5.shape[3]), int(x5.shape[4])
    da, fa = cfg.data_axis, cfg.pixel_axis
    d_sz = cfg.mesh.shape[da]
    f_sz = cfg.mesh.shape[fa]
    if 12 % f_sz:
        raise ValueError(
            f"face-sharded conv needs a face axis dividing 12, got {f_sz}"
        )
    if B % d_sz:
        raise ValueError(
            f"batch {B} not divisible by the data axis ({d_sz} shards)"
        )
    B_loc = B // d_sz
    Fout = kernel.shape[-1]
    # interpret mode everywhere except a real TPU compile: the sharded
    # path has no XLA fallback, and the multichip dryrun runs on virtual
    # CPU devices.  use_pallas="off" is an explicit opt-out the interpret
    # cliff must not silently override (on TPU it would run ~1000x slow).
    if config.use_pallas == "off":
        raise ValueError(
            "the face-sharded conv has no XLA fallback: with "
            "use_pallas='off' build the model with internal_layout='nest' "
            "(halo-sharded ELLPACK path) or re-enable the Pallas kernel"
        )
    interpret = config.pallas_mode() != "compile"
    tspecs = {
        k: P(None, fa, None, None) if k == "weights" else P() for k in tables
    }

    @partial(
        shard_map, mesh=cfg.mesh,
        in_specs=(tspecs, P(da, fa, None, None), P()),
        out_specs=P(da, fa, None, None), check_vma=False,
    )
    def conv(tbl, xc, kern):
        return face_sharded_cfp_conv(
            st, tbl, xc, kern, n_terms, kind, B_loc, axis_name=fa,
            interpret=interpret,
        )

    xc = x5.reshape(B * Fin, 12, n, P_l)
    y = conv(tables, xc, kernel)
    return y.reshape(B, Fout, 12, n, P_l).astype(x5.dtype)


def corner_box_depth(st):
    """Side length of the per-face corner boxes that contain every
    correction-ball source pixel (validated host-side)."""
    n, h = st.nside, st.n_steps
    D = min(n, 4 * max(h, 1))
    for patches in (ps._ball_patches(st), ps._corr_patches(st)):
        for face, x0, y0, sel in patches:
            rx, ry = sel.shape
            dx = x0 + rx if x0 < n // 2 else n - x0
            dy = y0 + ry if y0 < n // 2 else n - y0
            D = max(D, dx, dy)
    return D


def _extract_corner_boxes(st, arr, D):
    """(C*, F_loc, 2, 2, D, D): the four corner boxes of each local face
    (rows-first/last x cols-first/last), interior coordinates."""
    n, h = st.nside, st.n_steps
    rows = (arr[:, :, :D, :], arr[:, :, n - D :, :])
    out = []
    for r in rows:
        out.append(
            jnp.stack([r[:, :, :, h : h + D], r[:, :, :, h + n - D : h + n]],
                      axis=2)
        )
    return jnp.stack(out, axis=2)  # (C, F_loc, 2, 2, D, D)


def _box_coords(st, D, face, x0, y0, rx, ry):
    """Host-side: which corner box holds patch (face, x0, y0, rx, ry) and
    the in-box offsets."""
    n = st.nside
    cx = int(x0 >= n // 2)
    cy = int(y0 >= n // 2)
    bx = x0 - (n - D) if cx else x0
    by = y0 - (n - D) if cy else y0
    if not (0 <= bx and bx + rx <= D and 0 <= by and by + ry <= D):
        raise AssertionError("correction patch escapes its corner box")
    return cx, cy, bx, by


def _gather_rows_from_boxes(st, boxes, patches, count, D):
    """Patch-selected rows out of the all-gathered corner boxes:
    (count, C*).  Mirrors ``ps._gather_rows`` but sources remote-face data
    from ``boxes`` (C*, 12, 2, 2, D, D)."""
    out = jnp.zeros((count, boxes.shape[0]), boxes.dtype)
    for face, x0, y0, sel in patches:
        rx, ry = sel.shape
        cx, cy, bx, by = _box_coords(st, D, face, x0, y0, rx, ry)
        patch = boxes[:, face, cx, cy, bx : bx + rx, by : by + ry].reshape(
            boxes.shape[0], rx * ry
        )
        m = sel.reshape(-1) >= 0
        out = out.at[jnp.asarray(sel.reshape(-1)[m])].set(
            jnp.transpose(patch[:, jnp.asarray(np.nonzero(m)[0])])
        )
    return out


def _ball_terms_from_boxes(st, tables, boxes, n_terms, kind, D):
    """Per-term ball basis values, sourced from the gathered corner boxes."""
    idx = tables["corr_idx"]
    val = tables["corr_val"]
    Bn = int(np.asarray(st.corr_src).shape[0])
    t = _gather_rows_from_boxes(
        st, boxes, ps._ball_patches(st), Bn, D
    ).astype(jnp.float32)
    yield t
    prev2, prev1 = None, t
    for k in range(1, n_terms):
        tk = ps._ball_spmv(idx, val, prev1)
        if kind == "cheby" and k >= 2:
            tk = 2.0 * tk - prev2
        yield tk
        prev2, prev1 = prev1, tk


def _guarded_patch(st, y, y_fix, f_off, F_loc, zero=False):
    """Apply the per-corner patches to the LOCAL faces of y
    (C*, F_loc, n, P_l): remote-face patches become no-op writes."""
    h = st.n_steps
    yt = None if zero else jnp.transpose(y_fix)  # (Cout, Rc)
    for face, x0, y0, sel in ps._corr_patches(st):
        selj = jnp.asarray(sel)
        rx, ry = sel.shape
        l0 = y0 + h
        fidx = face - f_off
        local = (fidx >= 0) & (fidx < F_loc)
        safe = jnp.clip(fidx, 0, F_loc - 1)
        cur = jax.lax.dynamic_slice(
            y, (0, safe, x0, l0), (y.shape[0], 1, rx, ry)
        )
        if zero:
            vals = jnp.zeros_like(cur)
        else:
            vals = yt[:, jnp.clip(selj, 0)][:, None].astype(y.dtype)
        new = jnp.where((selj >= 0) & local, vals, cur)
        y = jax.lax.dynamic_update_slice(y, new, (0, safe, x0, l0))
    return y


def _forward_sharded(st, kind, n_terms, B, axis_name, interpret,
                     tables, xc, kernel, strips=None):
    """xc: (C_loc, F_loc, n, P_l) local shard -> (Cout_loc, F_loc, n, P_l).

    B is the LOCAL batch (channel packing of this shard).  ``strips``:
    optional precomputed local strip tuple of this exact xc (the VJP
    shares the forward's strips — and their all_gather — with the dW
    pass).  Returns ``(y, strips)``.
    """
    n, h = st.nside, st.n_steps
    C = xc.shape[0]
    F_loc = xc.shape[1]
    n_shards = 12 // F_loc
    Fin = C // B
    Fout = kernel.shape[-1]

    wk3 = jnp.transpose(
        kernel.astype(jnp.float32).reshape(Fin, n_terms, Fout), (1, 0, 2)
    )
    xc = xc.astype(jnp.float32)
    f_idx = jax.lax.axis_index(axis_name)
    f_off = f_idx * F_loc

    if strips is None:
        # the only activation communication: all_gather the thin edge bands
        bands_local = extract_edge_bands(xc, n, h, embedded=True)
        bands = tuple(
            jax.lax.all_gather(b, axis_name, axis=1, tiled=True)
            for b in bands_local
        )
        # strips for all faces (cheap, small), dynamic-sliced to the shard
        strips_full = ps._strip_arrays(st, xc, faces=range(12), bands=bands)
        strips = tuple(
            jax.lax.dynamic_slice_in_dim(s, f_off, F_loc, axis=1)
            for s in strips_full
        )
    wext = tables["weights"].astype(jnp.float32)  # face-sharded by caller
    y = ps._run_stencil_kernel(
        st, kind, n_terms, xc, wext, strips, wk3, B, interpret
    )
    if tables["corr_src"].shape[0]:
        D = corner_box_depth(st)
        boxes = jax.lax.all_gather(
            _extract_corner_boxes(st, xc, D), axis_name, axis=1, tiled=True
        )
        hi = jax.lax.Precision.HIGHEST
        acc = None
        for k, tk in enumerate(
            _ball_terms_from_boxes(st, tables, boxes, n_terms, kind, D)
        ):
            d = jnp.einsum(
                "rbf,fo->rbo",
                tk[tables["corr_out_ball"]].reshape(-1, B, Fin), wk3[k],
                preferred_element_type=jnp.float32, precision=hi,
            ).reshape(-1, B * Fout)
            acc = d if acc is None else acc + d
        y = _guarded_patch(st, y, acc, f_off, F_loc)
    return y, strips


def face_sharded_cfp_conv(st: FaceStencil, tables, xc, kernel, n_terms, kind,
                          B, axis_name, interpret=False):
    """Fused polynomial graph conv with the face axis sharded on
    ``axis_name`` (call inside ``shard_map``).

    :param tables: stencil tables with ``weights`` face-sharded to the
        local faces and the ``corr_*`` arrays replicated
    :param xc: (B*Fin, F_loc, n, P_l) local activation shard (b-major
        channels, B = local batch)
    :return: (B*Fout, F_loc, n, P_l) local output shard

    The kernel cotangent is returned as this shard's LOCAL partial sum:
    ``shard_map``'s transpose rule psums cotangents of unmapped inputs
    over the whole mesh, which performs the (face x batch) reduction —
    an explicit psum here would double-count.
    """

    @partial(jax.custom_vjp, nondiff_argnums=())
    def conv(tables, xc, kernel):
        y, _ = _forward_sharded(st, kind, n_terms, B, axis_name, interpret,
                                tables, xc, kernel)
        return y

    def fwd(tables, xc, kernel):
        y, strips = _forward_sharded(st, kind, n_terms, B, axis_name,
                                     interpret, tables,
                                     xc.astype(jnp.float32), kernel)
        return y, (tables, xc, strips, kernel)

    def bwd(res, dy):
        tables, xc, strips, kernel = res
        C = xc.shape[0]
        F_loc = xc.shape[1]
        Fin = C // B
        Fout = kernel.shape[-1]
        dy = dy.astype(jnp.float32)
        f_off = jax.lax.axis_index(axis_name) * F_loc
        has_corr = bool(tables["corr_src"].shape[0])

        # dx: the patched forward computes the exact symmetric operator,
        # so its adjoint is the same sharded conv with W^T on the full dy
        kernel_t = (
            kernel.reshape(Fin, n_terms, Fout)
            .transpose(2, 1, 0)
            .reshape(Fout * n_terms, Fin)
        )
        dx, _ = _forward_sharded(st, kind, n_terms, B, axis_name, interpret,
                                 tables, dy, kernel_t)
        dx = dx.astype(xc.dtype)

        # dW: local band contractions + psum over the face axis; corrupt
        # rows contribute through the exact ball basis
        n, h = st.nside, st.n_steps
        xcf = xc.astype(jnp.float32)
        dy_clean = (
            _guarded_patch(st, dy, None, f_off, F_loc, zero=True)
            if has_corr else dy
        )
        # strips (and their all_gather) come from the forward residuals
        wext = tables["weights"].astype(jnp.float32)
        dwk = ps._run_grad_kernel(
            st, kind, n_terms, xcf, wext, strips, dy_clean, B, Fin, interpret
        ).reshape(n_terms, Fin, Fout)
        if has_corr:
            D = corner_box_depth(st)
            xboxes = jax.lax.all_gather(
                _extract_corner_boxes(st, xcf, D), axis_name, axis=1,
                tiled=True,
            )
            dboxes = jax.lax.all_gather(
                _extract_corner_boxes(st, dy, D), axis_name, axis=1,
                tiled=True,
            )
            basis = jnp.stack(
                [
                    tk[tables["corr_out_ball"]]
                    for tk in _ball_terms_from_boxes(
                        st, tables, xboxes, n_terms, kind, D
                    )
                ],
                axis=0,
            )  # (K, Rc, C)
            Rc = int(np.asarray(st.corr_out_face).shape[0])
            dy_rc = _gather_rows_from_boxes(
                st, dboxes, ps._corr_patches(st), Rc, D
            )
            contrib = jnp.einsum(
                "krbf,rbo->kfo",
                basis.reshape(n_terms, -1, B, Fin),
                dy_rc.reshape(-1, B, Fout),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # the ball term is replicated across the face axis but distinct
            # per batch shard; shard_map's transpose sums over the whole
            # mesh, so emit it on face-rank 0 only
            on0 = (jax.lax.axis_index(axis_name) == 0).astype(contrib.dtype)
            dwk = dwk + on0 * contrib
        dkernel = jnp.transpose(dwk, (1, 0, 2)).reshape(
            Fin * n_terms, Fout
        ).astype(kernel.dtype)

        dtables = jax.tree_util.tree_map(jnp.zeros_like, tables)
        return (dtables, dx, dkernel)

    conv.defvjp(fwd, bwd)
    return conv(tables, xc, kernel)