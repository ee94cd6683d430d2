"""Unattended on-chip validation queue for the fused kernel variants.

Runs the experiments that need real TPU hardware, in one process, each
stage banked to stdout as it completes (the tunnel/worker can die at any
time — see PERFORMANCE.md "measurement gotchas"):

1. bf16 band mode: Mosaic acceptance + on-chip correctness vs f32 at
   nside=128 (rel tol 3e-2), then timing at the headline nside.
2. f32 conv at DS_PALLAS_VMEM_MB=112 (Tr=128 band) — set the env var
   BEFORE launching; this stage just reports the Tr actually picked.
3. bf16 train step (fwd+dx+dW) timing.

Usage:  python tools/tpu_checks.py [nside]   (default 1024)
Env:    TC_STAGES selects stages (default all):
        0 = f32 acceptance of the round-2 default path at TC_SMALL_NSIDE
        1 = bf16 band-mode (stage A) correctness at TC_SMALL_NSIDE
        2 = f32 + bf16 conv timing at the headline nside ("2f": f32 only)
        3 = bf16 train-step timing
        4 = Mosaic bf16 construct probes (informs the bf16-I/O design)
        5 = bf16 HBM-I/O (stage B) correctness at TC_SMALL_NSIDE
        6 = bf16 HBM-I/O conv + train timing at the headline nside
        7 = deep-halo k in {20,40,60} correctness vs ELLPACK + timing
            (configs via TC_DEEP, default "20:256,40:128,60:128")
        8 = quick-start shape (radius-1 K=10, halo 9 -> padded 16)
            fused correctness vs ELLPACK + timing (TC_QS_NSIDE, def 64)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SMALL_NSIDE = int(os.environ.get("TC_SMALL_NSIDE", 128))
K, FIN, FOUT, BATCH = 5, 4, 4, 4
STAGES = set(os.environ.get("TC_STAGES", "0,1,2,3,4,5,6,7,8").split(","))


def bank(name, **kv):
    print("CHECK " + json.dumps({"stage": name, **kv}), flush=True)


class _Skip(Exception):
    pass


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin forces platform priority "axon,cpu"; the env var
        # alone is not honored — update the config (CPU smoke runs)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config

    if os.environ.get("DS_USE_PALLAS"):
        # CPU smoke runs force interpret mode ("on"); on TPU the default
        # "auto" already resolves to compiled pallas
        ds_config.set_use_pallas(os.environ["DS_USE_PALLAS"])
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import (
        cface_embed,
        stencil_graph_conv,
        stencil_tables,
    )

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    rng = np.random.RandomState(0)

    def setup(nside):
        graph = build_sphere_graph(nside, k=8, method="grid", cache_dir=cache)
        st = graph.face_stencil(0.75, n_steps=K - 1)
        tables = jax.device_put(stencil_tables(st))
        kernel = jnp.asarray(
            rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32
        )
        x = jnp.asarray(
            rng.normal(size=(BATCH, graph.n_pixels, FIN)), jnp.float32
        )
        xc = jax.block_until_ready(
            jax.jit(
                lambda x: cface_embed(x, st.nside, st.n_steps).reshape(
                    BATCH * FIN, 12, st.nside, -1
                )
            )(x)
        )
        return st, tables, xc, kernel

    def timed(fn, tables, xc, kernel, n_iters=20):
        z = fn(tables, xc, kernel)
        np.asarray(z[(0,) * z.ndim])
        for _ in range(3):
            z = fn(tables, z, kernel)
        np.asarray(z[(0,) * z.ndim])
        t0 = time.time()
        for _ in range(n_iters):
            z = fn(tables, z, kernel)
        np.asarray(z[(0,) * z.ndim])
        return (time.time() - t0) / n_iters

    interpret = jax.default_backend() != "tpu"

    def conv_fn():
        # fresh python fn per call -> fresh jit cache entry (the conv
        # dtype is read at trace time)
        @jax.jit
        def conv(tables, xc, kernel):
            return ps.fused_stencil_conv_cfp(
                st, tables, xc, kernel, K, "cheby", BATCH,
                interpret=interpret,
            )

        return conv

    # -- stage 0: f32 acceptance of the round-2 default path --------------
    # (packed single-DMA lane strips + fused dx+dW are new constructs;
    # verify Mosaic accepts them and the numbers match the XLA stencil
    # path BEFORE spending 5-10 min compiles at the headline nside)
    try:
        if "0" not in STAGES:
            raise _Skip
        st, tables, xc, kernel = setup(SMALL_NSIDE)
        h, n = st.n_steps, st.nside
        y = jax.block_until_ready(conv_fn()(tables, xc, kernel))
        ds_config.set_use_pallas("off")
        try:
            x_flat = jnp.transpose(
                xc.reshape(BATCH, FIN, 12, n, -1)[:, :, :, :, h : h + n]
                .reshape(BATCH, FIN, 12 * n * n),
                (0, 2, 1),
            )

            @jax.jit
            def conv_xla(tables, x, kernel):
                return stencil_graph_conv(
                    st, x, kernel, K, "cheby", tables=tables, layout="face"
                )

            y_ref = jax.block_until_ready(conv_xla(tables, x_flat, kernel))
        finally:
            ds_config.set_use_pallas("auto")
        a = np.asarray(y[:, :, :, h : h + n]).reshape(BATCH, FOUT, -1)
        b = np.transpose(np.asarray(y_ref), (0, 2, 1)).reshape(
            BATCH, FOUT, -1
        )
        rel = float(np.abs(b - a).max() / max(np.abs(a).max(), 1e-8))
        bank("f32_fwd_accept_128", rel_err=round(rel, 7), ok=rel < 1e-4)

        # fused dx+dW vs the two-kernel backward
        def grads():
            def loss(xc, kernel):
                yy = ps.fused_stencil_conv_cfp(
                    st, tables, xc, kernel, K, "cheby", BATCH,
                    interpret=interpret,
                )
                return jnp.sum(yy * yy)

            return jax.jit(jax.grad(loss, argnums=(0, 1)))(xc, kernel)

        dx1, dk1 = (jax.block_until_ready(g) for g in grads())
        ds_config.set_fused_dw(False)
        try:
            dx2, dk2 = (jax.block_until_ready(g) for g in grads())
        finally:
            ds_config.set_fused_dw(True)
        rdx = float(
            np.abs(np.asarray(dx1 - dx2)[:, :, :, h : h + n]).max()
            / max(np.abs(np.asarray(dx2)).max(), 1e-8)
        )
        rdk = float(np.abs(np.asarray(dk1 - dk2)).max()
                    / max(np.abs(np.asarray(dk2)).max(), 1e-8))
        bank("f32_fused_dw_accept_128", rel_dx=round(rdx, 7),
             rel_dk=round(rdk, 7), ok=max(rdx, rdk) < 1e-4)
        del st, tables, xc, kernel
    except _Skip:
        pass
    except Exception as e:
        bank("f32_accept_128", error=str(e)[:300])

    # -- stage 1: bf16 correctness on-chip at nside=128 ------------------
    try:
        if "1" not in STAGES:
            raise _Skip
        st, tables, xc, kernel = setup(SMALL_NSIDE)
        y32 = jax.block_until_ready(conv_fn()(tables, xc, kernel))
        ds_config.set_conv_dtype("bfloat16")
        try:
            y16 = jax.block_until_ready(conv_fn()(tables, xc, kernel))
        finally:
            ds_config.set_conv_dtype("float32")
        h, n = st.n_steps, st.nside
        a = np.asarray(y32[:, :, :, h : h + n])
        b = np.asarray(y16[:, :, :, h : h + n])
        rel = float(np.abs(b - a).max() / max(np.abs(a).max(), 1e-8))
        bank("bf16_correct_128", rel_err=round(rel, 5), ok=rel < 3e-2)
        del st, tables, xc, kernel, y32, y16
    except _Skip:
        pass
    except Exception as e:
        bank("bf16_correct_128", error=str(e)[:300])

    # -- stage 2: f32 vs bf16 conv timing at the headline nside ----------
    try:
        if "2" not in STAGES and "2f" not in STAGES:
            raise _Skip
        st, tables, xc, kernel = setup(NSIDE)
        geo = ps._band_geometry(st, BATCH * FIN, BATCH * FOUT)
        bank("geometry_f32", Tr=int(geo[4]),
             vmem_mb=os.environ.get("DS_PALLAS_VMEM_MB", "96"))
        dt32 = timed(conv_fn(), tables, xc, kernel)
        bank("conv_f32", nside=NSIDE, step_ms=round(dt32 * 1e3, 2),
             maps_per_s=round(BATCH / dt32, 1))
        if "2" not in STAGES:  # "2f": f32-only timing (Tr A/B runs)
            raise _Skip
        ds_config.set_conv_dtype("bfloat16")
        try:
            geo = ps._band_geometry(st, BATCH * FIN, BATCH * FOUT,
                                    bdt=jnp.bfloat16)
            bank("geometry_bf16", Tr=int(geo[4]))
            dt16 = timed(conv_fn(), tables, xc, kernel)
            bank("conv_bf16", nside=NSIDE, step_ms=round(dt16 * 1e3, 2),
                 maps_per_s=round(BATCH / dt16, 1),
                 speedup=round(dt32 / dt16, 2))
        finally:
            ds_config.set_conv_dtype("float32")
    except _Skip:
        pass
    except Exception as e:
        bank("conv_timing", error=str(e)[:300])

    # -- stage 5: bf16 HBM I/O (stage B) correctness on-chip --------------
    try:
        if "5" not in STAGES:
            raise _Skip
        from deepsphere_tpu.ops.stencil import stencil_tables as _stt

        st, tables, xc, kernel = setup(SMALL_NSIDE)
        h, n = st.n_steps, st.nside
        y32 = jax.block_until_ready(conv_fn()(tables, xc, kernel))
        ds_config.set_conv_dtype("bfloat16_io")
        try:
            tio = jax.device_put(_stt(st, bf16_io=True))
            xio = xc.astype(jnp.bfloat16)
            yio = jax.block_until_ready(conv_fn()(tio, xio, kernel))

            # fused dx+dW through the io path
            def loss(xio, kernel):
                yy = ps.fused_stencil_conv_cfp(
                    st, tio, xio, kernel, K, "cheby", BATCH,
                    interpret=interpret,
                )
                return jnp.sum(yy.astype(jnp.float32) ** 2)

            dx, dk = jax.jit(jax.grad(loss, argnums=(0, 1)))(xio, kernel)
            jax.block_until_ready(dk)
        finally:
            ds_config.set_conv_dtype("float32")
        a = np.asarray(y32[:, :, :, h : h + n], np.float32)
        b = np.asarray(yio[:, :, :, h : h + n], np.float32)
        rel = float(np.abs(b - a).max() / max(np.abs(a).max(), 1e-8))
        bank("bf16_io_correct", nside=SMALL_NSIDE, rel_err=round(rel, 5),
             ok=rel < 3e-2, grads_ok=bool(np.isfinite(np.asarray(dk)).all()))
        del st, tables, xc, kernel, y32, yio, tio, xio, dx, dk
    except _Skip:
        pass
    except Exception as e:
        bank("bf16_io_correct", error=str(e)[:300])

    # -- stage 6: bf16 I/O timing at the headline nside --------------------
    try:
        if "6" not in STAGES:
            raise _Skip
        from deepsphere_tpu.ops.stencil import stencil_tables as _stt

        st, tables, xc, kernel = setup(NSIDE)
        del tables
        ds_config.set_conv_dtype("bfloat16_io")
        try:
            tio = jax.device_put(_stt(st, bf16_io=True))
            xio = jax.block_until_ready(xc.astype(jnp.bfloat16))
            del xc
            geo = ps._band_geometry(st, BATCH * FIN, BATCH * FOUT,
                                    bdt=jnp.bfloat16, iodt=jnp.bfloat16)
            bank("geometry_bf16_io", Tr=int(geo[4]), R=int(geo[2]))
            dt = timed(conv_fn(), tio, xio, kernel)
            bank("conv_bf16_io", nside=NSIDE, step_ms=round(dt * 1e3, 2),
                 maps_per_s=round(BATCH / dt, 1))

            @jax.jit
            def train_like_io(tables, xc, kernel):
                def loss(xc, kernel):
                    y = ps.fused_stencil_conv_cfp(
                        st, tables, xc, kernel, K, "cheby", BATCH,
                        interpret=interpret,
                    )
                    return jnp.sum(y.astype(jnp.float32) ** 2)

                _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(
                    xc, kernel)
                return dx, kernel - 1e-12 * dk

            z, kz = train_like_io(tio, xio, kernel)
            np.asarray(kz[0, 0])
            for _ in range(3):
                z, kz = train_like_io(tio, z, kz)
            np.asarray(kz[0, 0])
            t0 = time.time()
            for _ in range(10):
                z, kz = train_like_io(tio, z, kz)
            np.asarray(kz[0, 0])
            bank("train_bf16_io",
                 step_ms=round((time.time() - t0) / 10 * 1e3, 2))
        finally:
            ds_config.set_conv_dtype("float32")
    except _Skip:
        pass
    except Exception as e:
        bank("bf16_io", error=str(e)[:300])

    # -- stage 4: Mosaic bf16 construct probes ---------------------------
    # (informs the bf16 HBM-I/O design: are 8-row DMA slices, sublane
    # rolls, and masked sub-lane stores accepted for bf16 arrays?)
    if "4" in STAGES:
        from functools import partial

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def probe(name, build):
            try:
                out = jax.block_until_ready(build())
                bank("probe_" + name, ok=True,
                     checksum=float(np.asarray(out).astype(np.float32).sum()))
            except Exception as e:
                bank("probe_" + name, ok=False, error=str(e)[:200])

        bf = jnp.bfloat16
        xb = jnp.arange(48 * 256, dtype=jnp.float32).reshape(48, 256) / 997.0

        def dma8_kernel(x_ref, o_ref, sc, sem):
            c = pltpu.make_async_copy(x_ref.at[pl.ds(8, 16), :], sc, sem)
            c.start()
            c.wait()
            o_ref[...] = sc[...]

        def dma8():
            return pl.pallas_call(
                dma8_kernel,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, 256), bf),
                scratch_shapes=[pltpu.VMEM((16, 256), bf),
                                pltpu.SemaphoreType.DMA],
            )(xb.astype(bf))

        probe("bf16_dma_8row", dma8)

        def dma8off_kernel(x_ref, o_ref, sc, sem):
            # offset 8, size 8: both sub-(16-row)-tile for bf16
            c = pltpu.make_async_copy(x_ref.at[pl.ds(8, 8), :], sc, sem)
            c.start()
            c.wait()
            o_ref[...] = sc[...]

        def dma8off():
            return pl.pallas_call(
                dma8off_kernel,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 256), bf),
                scratch_shapes=[pltpu.VMEM((8, 256), bf),
                                pltpu.SemaphoreType.DMA],
            )(xb.astype(bf))

        probe("bf16_dma_8row_8size", dma8off)

        def roll_kernel(x_ref, o_ref):
            o_ref[...] = pltpu.roll(x_ref[...], 1, axis=0) + pltpu.roll(
                x_ref[...], 1, axis=1
            )

        def roll():
            return pl.pallas_call(
                roll_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((48, 256), bf),
            )(xb.astype(bf))

        probe("bf16_roll", roll)

        def substore_kernel(x_ref, o_ref):
            o_ref[...] = jnp.zeros_like(o_ref)
            o_ref[4:20, 0:8] = x_ref[4:20, 0:8]

        def substore():
            return pl.pallas_call(
                substore_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((48, 256), bf),
            )(xb.astype(bf))

        probe("bf16_masked_substore", substore)

    # -- stage 3: bf16 train step timing ---------------------------------
    try:
        if "3" not in STAGES:
            raise _Skip
        if any(nm not in dir() for nm in ("st", "tables", "xc", "kernel")):
            # stage 2 didn't run, or a later-in-file stage deleted some of
            # the arrays (stage 6 keeps st but dels tables/xc)
            st, tables, xc, kernel = setup(NSIDE)
        ds_config.set_conv_dtype("bfloat16")

        @jax.jit
        def train_like(tables, xc, kernel):
            def loss(xc, kernel):
                y = ps.fused_stencil_conv_cfp(
                    st, tables, xc, kernel, K, "cheby", BATCH,
                    interpret=interpret,
                )
                return jnp.sum(y * y)

            _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(xc, kernel)
            return dx, kernel - 1e-12 * dk

        z, kz = train_like(tables, xc, kernel)
        np.asarray(kz[0, 0])
        for _ in range(3):
            z, kz = train_like(tables, z, kz)
        np.asarray(kz[0, 0])
        t0 = time.time()
        for _ in range(10):
            z, kz = train_like(tables, z, kz)
        np.asarray(kz[0, 0])
        dt = (time.time() - t0) / 10
        bank("train_bf16", step_ms=round(dt * 1e3, 2))
    except _Skip:
        pass
    except Exception as e:
        bank("train_bf16", error=str(e)[:300])
    finally:
        ds_config.set_conv_dtype("float32")

    # -- stage 7: deep-halo k in {20, 40, 60} (radius 2/3/4) --------------
    # correctness vs the ELLPACK gather path + timing — the reference
    # treats these degrees as first-class (healpy_networks.py:39-42), and
    # the radius-2 path VMEM-OOMed the round-2 bench before the band-
    # sizing fix (ops/pallas_stencil._vmem_est lap_temps)
    if "7" in STAGES:
        from deepsphere_tpu.ops.spmv import chebyshev_basis, graph_conv
        from deepsphere_tpu.sphere.faces import face2nest_index

        # k=20 exercises the fused radius-2 kernel; k=40/60 (radius 3/4)
        # run the per-step XLA stencil path by default — correct fused
        # since the round-4 sublane padding (k=40@128 err 7.2e-7 at
        # 30.92 ms, k=60@128 err 4.8e-7 at 40.08 ms) but measured slower
        # than XLA (11.43 ms at k=40@128), so fused_available declines
        # radius >= 3 in compiled mode; DS_ALLOW_FUSED_R3=1 re-probes the
        # fused form.  Graph builds at nside=128 are ~1 min since the
        # native stencil-plane extractor.
        deep_cfgs = os.environ.get(
            "TC_DEEP", "20:256,40:128,60:128"
        ).split(",")
        for spec in deep_cfgs:
            kk, ns = (int(v) for v in spec.split(":"))
            name = f"deep_k{kk}_n{ns}"
            try:
                g = build_sphere_graph(ns, k=kk, method="grid",
                                       cache_dir=cache)
                stk = g.deep_stencil(0.75, K)
                tk = jax.device_put(stencil_tables(stk))
                kern = jnp.asarray(
                    rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32
                )
                xn = rng.normal(size=(BATCH, g.n_pixels, FIN)).astype(
                    np.float32
                )
                idx_np, val_np = g.ellpack(0.75)
                ell = jax.device_put({"idx": idx_np, "val": val_np})
                y_ref_nest = np.asarray(jax.jit(
                    lambda e, x, kr: graph_conv(
                        lambda x2d, nt: chebyshev_basis(
                            e["idx"], e["val"], x2d, nt
                        ), x, kr, K,
                    )
                )(ell, jnp.asarray(xn), kern))
                del ell
                f2n = face2nest_index(ns)
                xf = np.empty_like(xn)
                xf[:, f2n, :] = xn
                y_ref = np.empty_like(y_ref_nest)
                y_ref[:, f2n, :] = y_ref_nest

                @jax.jit
                def convk(tables, x, kr, stk=stk):
                    return stencil_graph_conv(
                        stk, x, kr, K, "cheby", tables=tables, layout="face"
                    )

                xj = jnp.asarray(xf)
                yk = np.asarray(convk(tk, xj, kern))
                err = float(np.abs(yk - y_ref).max())
                dt = timed(convk, tk, xj, kern, n_iters=10)
                bank(name, radius=int(stk.radius), h=int(stk.n_steps),
                     max_abs_err=err, ok=err < 1e-4,
                     step_ms=round(dt * 1e3, 2))
                del tk, xj
            except Exception as e:
                bank(name, error=str(e)[:300])

    if "8" in STAGES:
        # quick-start shape: radius-1 K=10 (halo 9 -> padded 16).  The
        # round-3 fault class was exactly this config; the round-4
        # sublane-tile padding (graph.deep_stencil) must make it run FUSED
        # on a clean chip with ELLPACK-level accuracy (reference flagship
        # architecture, quick_start.ipynb cell 7 / gnn_layers.py:137-150).
        from deepsphere_tpu.ops.spmv import chebyshev_basis, graph_conv
        from deepsphere_tpu.sphere.faces import face2nest_index

        K10 = 10
        ns = int(os.environ.get("TC_QS_NSIDE", 64))
        name = f"qs10_n{ns}"
        try:
            g = build_sphere_graph(ns, k=8, method="grid", cache_dir=cache)
            stq = g.deep_stencil(0.75, K10)
            assert ps.fused_available(stq, "cheby", K10), (
                f"padded h={stq.n_steps} must be fused-eligible"
            )
            tq = jax.device_put(stencil_tables(stq))
            kern = jnp.asarray(
                rng.normal(scale=0.1, size=(FIN * K10, FOUT)), jnp.float32
            )
            xn = rng.normal(size=(BATCH, g.n_pixels, FIN)).astype(np.float32)
            idx_np, val_np = g.ellpack(0.75)
            ell = jax.device_put({"idx": idx_np, "val": val_np})
            y_ref_nest = np.asarray(jax.jit(
                lambda e, x, kr: graph_conv(
                    lambda x2d, nt: chebyshev_basis(
                        e["idx"], e["val"], x2d, nt
                    ), x, kr, K10,
                )
            )(ell, jnp.asarray(xn), kern))
            del ell
            f2n = face2nest_index(ns)
            xf = np.empty_like(xn)
            xf[:, f2n, :] = xn
            y_ref = np.empty_like(y_ref_nest)
            y_ref[:, f2n, :] = y_ref_nest

            @jax.jit
            def convq(tables, x, kr):
                return stencil_graph_conv(
                    stq, x, kr, K10, "cheby", tables=tables, layout="face"
                )

            xj = jnp.asarray(xf)
            yq = np.asarray(convq(tq, xj, kern))
            err = float(np.abs(yq - y_ref).max())
            dt = timed(convq, tq, xj, kern, n_iters=10)
            bank(name, radius=int(stq.radius), h=int(stq.n_steps),
                 max_abs_err=err, ok=err < 1e-4,
                 step_ms=round(dt * 1e3, 2))
        except Exception as e:
            bank(name, error=str(e)[:300])


if __name__ == "__main__":
    main()
