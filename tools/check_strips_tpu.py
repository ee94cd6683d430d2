"""On-chip validation of the Pallas strip builder.

Stages (each banked as it completes):
  1. exact-equality vs the XLA assembly at nside=128 (compile mode)
  2. strips-only timing at the headline nside (builder vs XLA)
  3. full conv + train-step timing with the builder on (the default)

Usage: python tools/check_strips_tpu.py [nside]
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
    print("STRIPS " + json.dumps({"stage": name, **kv}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.pallas_strips import build_strips_pallas
    from deepsphere_tpu.ops.stencil import cface_embed, stencil_tables

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    rng = np.random.RandomState(0)

    def setup(nside, C):
        graph = build_sphere_graph(nside, k=8, method="grid",
                                   cache_dir=cache)
        st = graph.face_stencil(0.75, n_steps=K - 1)
        x = jnp.asarray(
            rng.normal(size=(1, graph.n_pixels, C)), jnp.float32
        )
        xc = jax.block_until_ready(
            jax.jit(
                lambda x: cface_embed(x, st.nside, st.n_steps).reshape(
                    C, 12, st.nside, -1
                )
            )(x)
        )
        return graph, st, xc

    # -- stage 1: compile-mode exactness at nside=128 --------------------
    try:
        _, st, xc = setup(128, BATCH * FIN)
        want = jax.jit(lambda xc: ps._strip_arrays(st, xc))(xc)
        got = jax.jit(
            lambda xc: build_strips_pallas(st, xc, interpret=False)
        )(xc)
        errs = {}
        ok = True
        for name, w, g in zip(("top", "bot", "ls"), want, got):
            d = float(np.max(np.abs(np.asarray(w) - np.asarray(g))))
            errs[name] = d
            ok = ok and d == 0.0
        bank("exact_128", ok=ok, **errs)
        if not ok:
            return
    except Exception as e:  # noqa: BLE001
        bank("exact_128", ok=False, error=str(e)[:400])
        return

    # -- stage 2: strips-only timing at the headline nside ---------------
    graph, st, xc = setup(NSIDE, BATCH * FIN)

    def timed_strips(fn, n_iters=20):
        @jax.jit
        def step(x):
            t, b, ls = fn(x)
            return x + 0.0 * (jnp.sum(t) + jnp.sum(b) + jnp.sum(ls))

        z = step(xc)
        np.asarray(z[0, 0, 0, 0])
        for _ in range(3):
            z = step(z)
        np.asarray(z[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(n_iters):
            z = step(z)
        np.asarray(z[0, 0, 0, 0])
        return (time.time() - t0) / n_iters

    try:
        dt_x = timed_strips(lambda x: ps._strip_arrays(st, x))
        dt_p = timed_strips(
            lambda x: build_strips_pallas(st, x, interpret=False)
        )
        bank("strips_timing", xla_ms=round(dt_x * 1e3, 2),
             pallas_ms=round(dt_p * 1e3, 2),
             speedup=round(dt_x / dt_p, 1))
    except Exception as e:  # noqa: BLE001
        bank("strips_timing", error=str(e)[:400])

    # -- stage 3: conv + train timing with the builder (default on) ------
    tables = jax.device_put(stencil_tables(st))
    kernel = jnp.asarray(
        rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32
    )

    def timed_conv(n_iters=20):
        @jax.jit
        def conv(tables, xc, kernel):
            return ps.fused_stencil_conv_cfp(
                st, tables, xc, kernel, K, "cheby", BATCH, interpret=False
            )

        z = conv(tables, xc, kernel)
        np.asarray(z[0, 0, 0, 0])
        for _ in range(3):
            z = conv(tables, z, kernel)
        np.asarray(z[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(n_iters):
            z = conv(tables, z, kernel)
        np.asarray(z[0, 0, 0, 0])
        return (time.time() - t0) / n_iters

    def timed_train(n_iters=10):
        @jax.jit
        def train_like(tables, xc, kernel):
            def loss(xc, kernel):
                y = ps.fused_stencil_conv_cfp(
                    st, tables, xc, kernel, K, "cheby", BATCH,
                    interpret=False,
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

    for mode in ("pallas", "xla"):
        ds_config.set_strips_mode(mode)
        try:
            dt_c = timed_conv()
            dt_t = timed_train()
            bank("conv_train_" + mode,
                 conv_ms=round(dt_c * 1e3, 2),
                 maps_per_s=round(BATCH / dt_c, 1),
                 train_ms=round(dt_t * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            bank("conv_train_" + mode, error=str(e)[:400])
        finally:
            ds_config.set_strips_mode("auto")

    # numerical cross-check at the headline size: one conv, both modes
    try:
        ds_config.set_strips_mode("xla")
        y0 = jax.jit(
            lambda t, x, k: ps.fused_stencil_conv_cfp(
                st, t, x, k, K, "cheby", BATCH, interpret=False
            )
        )(tables, xc, kernel)
        y0 = np.asarray(y0[:, :, :, 8 : 8 + NSIDE])
        ds_config.set_strips_mode("pallas")
        y1 = jax.jit(
            lambda t, x, k: ps.fused_stencil_conv_cfp(
                st, t, x, k, K, "cheby", BATCH, interpret=False
            )
        )(tables, xc, kernel)
        y1 = np.asarray(y1[:, :, :, 8 : 8 + NSIDE])
        bank("exact_headline", max_abs=float(np.max(np.abs(y0 - y1))))
    except Exception as e:  # noqa: BLE001
        bank("exact_headline", error=str(e)[:400])
    finally:
        ds_config.set_strips_mode("auto")


if __name__ == "__main__":
    main()
