"""On-chip cost bisection of the fused conv at the headline config.

Decomposes the conv step into recursion / contraction / lane-store /
residual (DMA + per-band overhead) by timing the kernel with stages
disabled (config.debug_kernel_bisect + DS_KB), and measures the per-band
fixed overhead via the Tr=32 vs Tr=64 slope (DS_PALLAS_VMEM_MB).

Usage: python tools/bisect_r2.py [nside]   (TPU; ~40 min of compiles)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K, FIN, FOUT, BATCH = 5, 4, 4, 4


def bank(name, **kv):
    print("BISECT " + json.dumps({"stage": name, **kv}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import cface_embed, stencil_tables

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    rng = np.random.RandomState(0)
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
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
    interpret = jax.default_backend() != "tpu"

    def timed(n_iters=20):
        @jax.jit
        def conv(tables, xc, kernel):
            return ps.fused_stencil_conv_cfp(
                st, tables, xc, kernel, K, "cheby", BATCH,
                interpret=interpret,
            )

        z = conv(tables, xc, kernel)
        np.asarray(z[(0,) * z.ndim])
        for _ in range(3):
            z = conv(tables, z, kernel)
        np.asarray(z[(0,) * z.ndim])
        t0 = time.time()
        for _ in range(n_iters):
            z = conv(tables, z, kernel)
        np.asarray(z[(0,) * z.ndim])
        return (time.time() - t0) / n_iters

    results = {}
    # full kernel (post Chebyshev-fold), default Tr
    try:
        dt = timed()
        results["full_ms"] = round(dt * 1e3, 2)
        bank("full", step_ms=results["full_ms"],
             maps_per_s=round(BATCH / dt, 1))
    except Exception as e:
        bank("full", error=str(e)[:300])
        return

    ds_config.set_debug_kernel_bisect(True)
    try:
        for mode in ("norecur", "nocontract", "nolanestore"):
            os.environ["DS_KB"] = mode
            try:
                dt = timed()
                results[mode + "_ms"] = round(dt * 1e3, 2)
                bank(mode, step_ms=results[mode + "_ms"])
            except Exception as e:
                bank(mode, error=str(e)[:300])
    finally:
        os.environ.pop("DS_KB", None)
        ds_config.set_debug_kernel_bisect(False)

    # stacked MXU contraction ("dot" auto-upgrades to "dots" when the K
    # retained center slices fit VMEM) vs the default AXPY at this config
    ds_config.set_contract_mode("dot")
    try:
        dt = timed()
        results["dots_ms"] = round(dt * 1e3, 2)
        bank("dot_stacked", step_ms=results["dots_ms"],
             maps_per_s=round(BATCH / dt, 1))
    except Exception as e:
        bank("dot_stacked", error=str(e)[:300])
    finally:
        ds_config.set_contract_mode("auto")

    # kernel-only: the pallas_call with prebuilt strips/weights — isolates
    # the XLA-side per-conv work (strip rebuild + corner correction)
    try:
        wk3 = jnp.transpose(
            kernel.astype(jnp.float32).reshape(FIN, K, FOUT), (1, 0, 2)
        )
        strips = jax.block_until_ready(
            jax.jit(lambda x: ps._strip_arrays(st, x))(xc)
        )
        wext = tables["weights"].astype(jnp.float32)

        @jax.jit
        def conv_k(strips, xc, wk3):
            return ps._run_stencil_kernel(
                st, "cheby", K, xc, wext, strips, wk3, BATCH, interpret
            )

        z = conv_k(strips, xc, wk3)
        np.asarray(z[0, 0, 0, 0])
        for _ in range(3):
            z = conv_k(strips, z, wk3)
        np.asarray(z[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(20):
            z = conv_k(strips, z, wk3)
        np.asarray(z[0, 0, 0, 0])
        results["kernel_only_ms"] = round((time.time() - t0) / 20 * 1e3, 2)
        bank("kernel_only", step_ms=results["kernel_only_ms"])
    except Exception as e:
        bank("kernel_only", error=str(e)[:300])

    # strips-only: the per-conv strip rebuild
    try:
        @jax.jit
        def strips_fn(x):
            t, b, ls = ps._strip_arrays(st, x)
            # full checksums: single-element reads would let XLA dead-code
            # eliminate most of the strip build
            return x + 0.0 * (jnp.sum(t) + jnp.sum(b) + jnp.sum(ls))

        z = strips_fn(xc)
        np.asarray(z[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(20):
            z = strips_fn(z)
        np.asarray(z[0, 0, 0, 0])
        results["strips_ms"] = round((time.time() - t0) / 20 * 1e3, 2)
        bank("strips_only", step_ms=results["strips_ms"])
    except Exception as e:
        bank("strips_only", error=str(e)[:300])

    # corners-only: exact ball recursion + patch updates
    try:
        @jax.jit
        def corners_fn(tables, y, wk3):
            y_fix = ps._corrected_rows(st, tables, y, wk3, K, "cheby",
                                       BATCH)
            return ps._patch_corrections(st, y, y_fix)

        z = corners_fn(tables, xc, wk3)
        np.asarray(z[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(20):
            z = corners_fn(tables, z, wk3)
        np.asarray(z[0, 0, 0, 0])
        results["corners_ms"] = round((time.time() - t0) / 20 * 1e3, 2)
        bank("corners_only", step_ms=results["corners_ms"])
    except Exception as e:
        bank("corners_only", error=str(e)[:300])

    # Tr slope: smaller VMEM budget -> Tr=32 -> 2x the band count; the
    # time delta isolates the per-band fixed overhead
    os.environ["DS_PALLAS_VMEM_MB"] = "64"
    try:
        dt = timed()
        results["tr32_ms"] = round(dt * 1e3, 2)
        bank("tr32", step_ms=results["tr32_ms"])
    except Exception as e:
        bank("tr32", error=str(e)[:300])
    finally:
        os.environ.pop("DS_PALLAS_VMEM_MB", None)

    # train-step A/B: the fused dx+dW backward's dW side is 320 VPU
    # mul+reduce ops in axpy mode but two MXU dot_generals (contraction
    # over Tr*P) in dot mode — likely the bulk of the 38 ms train step
    def timed_train(n_iters=10):
        @jax.jit
        def train_like(tables, xc, kernel):
            def loss(xc, kernel):
                y = ps.fused_stencil_conv_cfp(
                    st, tables, xc, kernel, K, "cheby", BATCH,
                    interpret=interpret,
                )
                return jnp.sum(y * y)

            _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(
                xc, kernel
            )
            return dx, kernel - 1e-12 * dk

        z, kz = train_like(tables, xc, kernel)
        np.asarray(kz[0, 0])
        for _ in range(3):
            z, kz = train_like(tables, z, kz)
        np.asarray(kz[0, 0])
        t0 = time.time()
        for _ in range(n_iters):
            z, kz = train_like(tables, z, kz)
        np.asarray(kz[0, 0])
        return (time.time() - t0) / n_iters

    for mode, label in (("axpy", "train_axpy"), ("dot", "train_dot")):
        ds_config.set_contract_mode(mode)
        try:
            dt = timed_train()
            results[label + "_ms"] = round(dt * 1e3, 2)
            bank(label, step_ms=results[label + "_ms"])
        except Exception as e:
            bank(label, error=str(e)[:300])
        finally:
            ds_config.set_contract_mode("auto")

    if "norecur_ms" in results and "nocontract_ms" in results:
        full = results["full_ms"]
        rec = full - results["norecur_ms"]
        con = full - results["nocontract_ms"]
        lane = full - results.get("nolanestore_ms", full)
        bank("split", recursion_ms=round(rec, 2), contraction_ms=round(con, 2),
             lanestore_ms=round(lane, 2),
             rest_ms=round(full - rec - con - lane, 2))
    if "tr32_ms" in results:
        # nbands doubles 192 -> 384; slope = overhead per extra band
        per_band_us = (results["tr32_ms"] - results["full_ms"]) / 192 * 1e3
        bank("tr_slope", per_band_overhead_us=round(per_band_us, 1))


if __name__ == "__main__":
    main()
