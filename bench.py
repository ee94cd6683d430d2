"""Benchmark: maps/sec/chip for the K=5 Chebyshev graph convolution at
nside=1024 (the driver-defined north-star metric, BASELINE.json).

Runs on whatever the default jax platform is (the real TPU chip under axon).
The graph is built once with the fast O(M) grid constructor and cached to
``.bench_cache/`` so later rounds skip the host precompute.

Measures the model-native **cface** path (the layout the model assembler
threads between layers): channels-first padded face images through the fused
Pallas kernel — the full K-term Chebyshev recursion in VMEM, halo windows
assembled per band from structured edge-copy strips, contraction fused
(see ``deepsphere_tpu/ops/pallas_stencil.py``).  The (B, M, F) face-flat
wrapper path and the ELLPACK gather path are timed alongside in ``extra``.

``vs_baseline``: the reference repo publishes no benchmark numbers
(BASELINE.md), so we normalize against the only published throughput trace —
the quick_start classifier at ~0.6 s/step for batch 16 (26.7 maps/s on
unstated hardware, nside=64).  Our metric processes nside=1024 maps (256x
more pixels per map), so this normalization is very conservative.
"""

import json
import os
import time

import numpy as np

NSIDE = int(os.environ.get("BENCH_NSIDE", 1024))
K = 5
FIN = 4
FOUT = 4
BATCH = int(os.environ.get("BENCH_BATCH", 4))
REFERENCE_MAPS_PER_SEC = 16 / 0.6  # quick_start.ipynb cell 16 output

# Remote compiles through the tunnel cost 5-10 min EACH; the optional
# stages stop launching once this much wall clock is spent so the final
# JSON line always prints within the driver's budget.  The headline conv
# + train stages (the metric itself) are never skipped.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2100))
_T0 = time.time()


def _stage_on(extra, name, default="1"):
    """Stage gate: env opt-out plus the global wall-clock budget."""
    if os.environ.get("BENCH_" + name.upper(), default) != "1":
        return False
    if time.time() - _T0 > BUDGET_S:
        extra[name + "_skipped"] = "wall-clock budget (BENCH_BUDGET_S)"
        return False
    return True


def _time(fn, tables, x, kernel, n_iters=20):
    """Chained timing with host readback.

    The axon (tunneled-TPU) backend's block_until_ready can return before
    remote execution finishes, so timings must (a) chain iterations through
    a data dependency (Fin == Fout) and (b) end with a device->host read,
    which cannot complete early.
    """
    def readback(z):
        # device-side scalar first: np.ravel/np.asarray on the full array
        # would download GBs through the tunnel
        np.asarray(z[(0,) * z.ndim])

    z = fn(tables, x, kernel)  # compile + warmup
    readback(z)
    for _ in range(3):  # extra warmup: spread allocator/dispatch transients
        z = fn(tables, z, kernel)
    readback(z)
    t0 = time.time()
    for _ in range(n_iters):
        z = fn(tables, z, kernel)
    readback(z)
    return (time.time() - t0) / n_iters


def _progress(extra):
    """Bank partial results on stderr after every stage: a late-stage crash
    (TPU worker fault, OOM) must not lose the two hours of numbers that
    came before it."""
    import sys

    print("BENCH-PARTIAL " + json.dumps(extra), file=sys.stderr, flush=True)


def _model_bench(jax, jnp, cache):
    """quick_start-shaped model benchmark (reference architecture verbatim:
    4x Chebyshev K=10 + pools + mean-softmax head, quick_start.ipynb cell 7)
    at nside=64 batch 16 — catches regressions in layout converters, BN,
    pooling and the Trainer that the single-conv number cannot see.
    Reference baseline: ~0.6 s/step on unstated hardware (cell 16)."""
    import flax.linen as fnn
    import optax

    import deepsphere_tpu as ds
    from deepsphere_tpu.nn import healpy_layers as hp_nn

    nside = int(os.environ.get("BENCH_MODEL_NSIDE", 64))
    batch = 16
    npix = ds.sphere.healpix.nside2npix(nside)

    class MeanSoftmax(fnn.Module):
        @fnn.compact
        def __call__(self, x, training=False):
            return jax.nn.softmax(jnp.mean(x, axis=1), axis=-1)

    layers = [
        hp_nn.HealpyChebyshev(K=10, Fout=5, use_bias=True, use_bn=True,
                              activation="relu"),
        hp_nn.HealpyPool(p=1),
        hp_nn.HealpyChebyshev(K=10, Fout=5, use_bias=True, use_bn=True,
                              activation="relu"),
        hp_nn.HealpyPool(p=1),
        hp_nn.HealpyChebyshev(K=10, Fout=5, use_bias=True, use_bn=True,
                              activation="relu"),
        hp_nn.HealpyPool(p=1),
        hp_nn.HealpyChebyshev(K=10, Fout=2),
        MeanSoftmax(),
    ]
    model = ds.HealpyGCNN(nside=nside, indices=np.arange(npix),
                          layers=layers, graph_cache_dir=cache)
    x = jnp.asarray(
        np.random.RandomState(2).normal(size=(batch, npix, 1)), jnp.float32
    )
    y = jnp.asarray(np.arange(batch) % 2, jnp.int32)
    variables = model.init(0, x)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tables = {k: v for k, v in variables.items()
              if k not in ("params", "batch_stats")}

    def readback(t):
        leaf = jax.tree_util.tree_leaves(t)[0]
        if leaf.ndim == 0:
            np.asarray(leaf)
        else:
            np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])

    # forward: chain x through a zero-coupled output term
    @jax.jit
    def fwd(tables, params, stats, x):
        out = model.module.apply(
            {**tables, "params": params, "batch_stats": stats}, x,
            training=False,
        )
        return x + 0.0 * jnp.sum(out), out

    xc, out = fwd(tables, params, stats, x)
    readback(out)
    n_it = 10
    t0 = time.time()
    for _ in range(n_it):
        xc, out = fwd(tables, params, stats, xc)
    readback(out)
    qs_fwd = (time.time() - t0) / n_it

    # train step: params/opt-state chain naturally
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(tables, params, stats, opt, x, y):
        def loss_fn(p):
            out, upd = model.module.apply(
                {**tables, "params": p, "batch_stats": stats}, x,
                training=True, mutable=["batch_stats"],
            )
            # quick_start head emits probabilities; clip like Keras CE
            logp = jnp.log(jnp.clip(out, 1e-7, 1.0))
            loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    params, stats, opt, loss = step(tables, params, stats, opt, x, y)
    readback(loss)
    t0 = time.time()
    for _ in range(n_it):
        params, stats, opt, loss = step(tables, params, stats, opt, x, y)
    readback(loss)
    qs_train = (time.time() - t0) / n_it
    return {
        "qs_model_nside": nside,
        "qs_fwd_ms": round(qs_fwd * 1e3, 2),
        "qs_train_step_ms": round(qs_train * 1e3, 2),
        "qs_train_maps_per_s": round(batch / qs_train, 1),
    }


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CPU smoke runs: the axon plugin forces platform priority
        # "axon,cpu", so the env var alone is not honored
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops.pallas_stencil import cfp_geometry
    from deepsphere_tpu.ops.spmv import chebyshev_basis, graph_conv
    from deepsphere_tpu.ops.stencil import (
        stencil_graph_conv,
        stencil_graph_conv_cface,
        stencil_tables,
    )

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)

    t0 = time.time()
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    # deep stencil (n_steps = K-1) feeds the fused Pallas kernel on TPU
    st = graph.face_stencil(0.75, n_steps=K - 1)
    build_s = time.time() - t0

    npix = graph.n_pixels
    kernel = jnp.asarray(
        np.random.RandomState(0).normal(scale=0.1, size=(FIN * K, FOUT)), dtype=jnp.float32
    )
    x = jnp.asarray(
        np.random.RandomState(1).normal(size=(BATCH, npix, FIN)), dtype=jnp.float32
    )

    # graph tables enter as jit ARGUMENTS (hundreds of MB — must not be
    # embedded into the HLO as constants)
    st_tables = jax.device_put(stencil_tables(st))

    # the model's internal hot path runs in the cface layout (one
    # NEST->cface conversion per model forward, zero per-conv layout work)
    # — measure the conv in that native layout
    h = K - 1
    _, P_l = cfp_geometry(NSIDE, h)
    x5 = jnp.concatenate(
        [
            jnp.zeros((BATCH, FIN, 12, NSIDE, h), jnp.float32),
            jnp.transpose(x, (0, 2, 1)).reshape(BATCH, FIN, 12, NSIDE, NSIDE),
            jnp.zeros((BATCH, FIN, 12, NSIDE, P_l - NSIDE - h), jnp.float32),
        ],
        axis=4,
    )

    @jax.jit
    def conv_cface(tables, x5, kernel):
        return stencil_graph_conv_cface(st, x5, kernel, K, "cheby", tables=tables)

    extra = {
        "graph_build_s": round(build_s, 1),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }

    try:
        dt = _time(conv_cface, st_tables, x5, kernel)
    except Exception as e:
        # the fused kernel failed to compile/run on this backend: fall back
        # to the per-step XLA stencil path so the round still reports a
        # (slower) headline number instead of dying without a JSON line
        extra["fused_error"] = str(e)[:300]
        _progress(extra)
        import deepsphere_tpu.config as ds_config

        ds_config.set_use_pallas("off")

        @jax.jit
        def conv_cface_xla(tables, x5, kernel):
            return stencil_graph_conv_cface(
                st, x5, kernel, K, "cheby", tables=tables
            )

        dt = _time(conv_cface_xla, st_tables, x5, kernel, n_iters=5)
        extra["fallback"] = "xla_stencil"
    maps_per_sec = BATCH / dt
    extra["step_ms"] = round(dt * 1e3, 2)

    @jax.jit
    def conv_stencil(tables, x, kernel):
        return stencil_graph_conv(
            st, x, kernel, K, "cheby", tables=tables, layout="face"
        )

    dt_f = _time(conv_stencil, st_tables, x, kernel, n_iters=5)
    extra["face_flat_step_ms"] = round(dt_f * 1e3, 2)

    # training step at the headline config: fwd + dx + dW through the fused
    # conv's custom VJP.  BOTH cotangents must feed the next iteration —
    # returning dx alone lets XLA dead-code-eliminate the whole dW pass
    # (which silently under-reported train_step_ms by ~18 ms in round 2)
    @jax.jit
    def train_like(tables, x5, kernel):
        def loss(x5, kernel):
            y = stencil_graph_conv_cface(st, x5, kernel, K, "cheby",
                                         tables=tables)
            return jnp.sum(y * y)

        _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(x5, kernel)
        return dx, kernel - 1e-12 * dk

    def _time_train(n_iters=10):
        z, kz = train_like(st_tables, x5, kernel)
        np.asarray(kz[0, 0])
        for _ in range(3):
            z, kz = train_like(st_tables, z, kz)
        np.asarray(kz[0, 0])
        t0 = time.time()
        for _ in range(n_iters):
            z, kz = train_like(st_tables, z, kz)
        np.asarray(kz[0, 0])
        return (time.time() - t0) / n_iters

    try:
        dt_t = _time_train()
        extra["train_step_ms"] = round(dt_t * 1e3, 2)
        extra["train_over_fwd"] = round(dt_t / dt, 2)
    except Exception as e:
        extra["train_step_error"] = str(e)[:120]
    _progress(extra)

    import deepsphere_tpu.config as _cfg_mod

    if _cfg_mod.pallas_mode() is None:
        # conv_dtype only affects the fused kernel; timing the XLA
        # fallback would bank fake 'bf16' numbers
        if os.environ.get("BENCH_BF16", "0") == "1":
            extra["bf16_error"] = "skipped: fused kernel inactive"
        if os.environ.get("BENCH_BF16_IO", "0") == "1":
            extra["bf16_io_error"] = "skipped: fused kernel inactive"
        os.environ["BENCH_BF16"] = os.environ["BENCH_BF16_IO"] = "0"
        if "bf16_error" in extra or "bf16_io_error" in extra:
            _progress(extra)

    # bf16 band / bf16 HBM-I/O modes: measured and documented as SLOWER on
    # this ALU-bound VPU (PERFORMANCE.md) — off by default to keep the
    # bench inside the driver budget; re-enable with BENCH_BF16=1.
    if _stage_on(extra, "bf16", default="0"):
        # opt-in bf16 band mode: recursion at half the VMEM traffic, MXU
        # bf16 contraction with f32 accumulation (config.conv_dtype)
        import deepsphere_tpu.config as ds_config

        ds_config.set_conv_dtype("bfloat16")
        try:
            # separate python fn -> separate jit cache entry (the config
            # flag is read at trace time)
            @jax.jit
            def conv_bf16(tables, x5, kernel):
                return stencil_graph_conv_cface(
                    st, x5, kernel, K, "cheby", tables=tables
                )

            dt_b = _time(conv_bf16, st_tables, x5, kernel)
            extra["bf16_step_ms"] = round(dt_b * 1e3, 2)
            extra["bf16_maps_per_s"] = round(BATCH / dt_b, 1)
        except Exception as e:
            extra["bf16_error"] = str(e)[:160]
        finally:
            ds_config.set_conv_dtype("float32")
        _progress(extra)

    if _stage_on(extra, "bf16_io", default="0"):
        # stage B: bf16 HBM I/O — activations/strips/weight planes/output
        # all bf16 in HBM, so the DMA bytes halve on top of the stage-A
        # band mode (R widens to roundup(h, 16) for the 16-aligned bf16
        # DMA row slices).  Chained iterations keep bf16 end to end.
        import deepsphere_tpu.config as ds_config
        from deepsphere_tpu.ops.stencil import stencil_tables as _st_tables

        ds_config.set_conv_dtype("bfloat16_io")
        try:
            st_tables_io = jax.device_put(_st_tables(st, bf16_io=True))
            x5h = x5.astype(jnp.bfloat16)

            @jax.jit
            def conv_io(tables, x5, kernel):
                return stencil_graph_conv_cface(
                    st, x5, kernel, K, "cheby", tables=tables
                )

            dt_i = _time(conv_io, st_tables_io, x5h, kernel)
            extra["bf16_io_step_ms"] = round(dt_i * 1e3, 2)
            extra["bf16_io_maps_per_s"] = round(BATCH / dt_i, 1)

            @jax.jit
            def train_io(tables, x5, kernel):
                def loss(x5, kernel):
                    y = stencil_graph_conv_cface(
                        st, x5, kernel, K, "cheby", tables=tables
                    )
                    return jnp.sum(y.astype(jnp.float32) * y.astype(jnp.float32))

                _, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(
                    x5, kernel
                )
                return dx, kernel - 1e-12 * dk

            z, kz = train_io(st_tables_io, x5h, kernel)
            np.asarray(kz[0, 0])
            for _ in range(3):
                z, kz = train_io(st_tables_io, z, kz)
            np.asarray(kz[0, 0])
            t0 = time.time()
            for _ in range(10):
                z, kz = train_io(st_tables_io, z, kz)
            np.asarray(kz[0, 0])
            extra["bf16_io_train_step_ms"] = round(
                (time.time() - t0) / 10 * 1e3, 2
            )
            del st_tables_io, x5h, z, kz
        except Exception as e:
            extra["bf16_io_error"] = str(e)[:160]
        finally:
            ds_config.set_conv_dtype("float32")
        _progress(extra)

    if _stage_on(extra, "model"):
        try:
            extra.update(_model_bench(jax, jnp, cache))
        except Exception as e:
            extra["model_bench_error"] = str(e)[:160]
        _progress(extra)

    if _stage_on(extra, "k20"):
        # k=20 ring-template conv (radius-2 stencil) at nside=256: the
        # reference treats k in {20,40,60} as first-class
        # (healpy_networks.py:39-42); round 1 left them on the gather path
        try:
            n20 = int(os.environ.get("BENCH_K20_NSIDE", 256))
            g20 = build_sphere_graph(n20, k=20, method="grid", cache_dir=cache)
            st20 = g20.deep_stencil(0.75, K)
            t20 = jax.device_put(stencil_tables(st20))
            x20 = jnp.asarray(
                np.random.RandomState(3).normal(
                    size=(BATCH, g20.n_pixels, FIN)
                ), jnp.float32,
            )

            @jax.jit
            def conv20(tables, x, kernel):
                return stencil_graph_conv(
                    st20, x, kernel, K, "cheby", tables=tables, layout="face"
                )

            dt20 = _time(conv20, t20, x20, kernel, n_iters=10)
            extra["k20_nside"] = n20
            extra["k20_step_ms"] = round(dt20 * 1e3, 2)
            extra["k20_maps_per_s"] = round(BATCH / dt20, 1)
        except Exception as e:
            extra["k20_error"] = str(e)[:160]
        _progress(extra)

    if _stage_on(extra, "gather_path"):
        # free the stencil-path buffers first: the gather path's basis
        # stack peaks at K x activation, and HBM pressure distorts it
        del x5, st_tables
        idx_np, val_np = graph.ellpack(0.75)
        ell = jax.device_put({"idx": idx_np, "val": val_np})

        @jax.jit
        def conv_gather(ell, x, kernel):
            return graph_conv(
                lambda x2d, nt: chebyshev_basis(ell["idx"], ell["val"], x2d, nt),
                x, kernel, K,
            )

        try:
            dt_g = _time(conv_gather, ell, x, kernel, n_iters=2)
            extra["gather_path_step_ms"] = round(dt_g * 1e3, 2)
            extra["stencil_speedup"] = round(dt_g / dt, 2)
        except Exception as e:  # OOM at large nside etc.
            extra["gather_path_error"] = str(e)[:120]
        del ell
        _progress(extra)

    if _stage_on(extra, "smooth"):
        # Gaussian smoothing at the headline resolution (sigma = 10
        # arcmin): the stencil-decomposition path (m repetitions of a
        # radius-<=4 template; healpy_layers.py:510-853 semantics) —
        # the BallTree/ELLPACK form would need hundreds of serialized
        # gather passes here.  LAST: this stage once crashed the TPU
        # worker; everything before it must already be banked.
        try:
            from deepsphere_tpu.nn.smoothing import (HealpySmoothing,
                                                     SmoothingOperator)

            op = SmoothingOperator(
                nside=NSIDE, indices=np.arange(12 * NSIDE * NSIDE),
                sigma=10.0, method="stencil", data_path=cache,
            )
            lay = HealpySmoothing(operator=op)
            xs = jnp.asarray(
                np.random.RandomState(5).normal(
                    size=(1, 12 * NSIDE * NSIDE, 1)
                ), jnp.float32,
            )
            vs = lay.init(jax.random.PRNGKey(0), xs)
            tbl = {k: jax.device_put(v) for k, v in vs.items()}

            @jax.jit
            def smooth(tbl, xs):
                return lay.apply(tbl, xs)

            ys = smooth(tbl, xs)
            np.asarray(ys[0, 0, 0])
            t0 = time.time()
            for _ in range(5):
                ys = smooth(tbl, ys)
            np.asarray(ys[0, 0, 0])
            extra["smooth_sigma10_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
            extra["smooth_reps"] = int(op.stencil_reps)
            del xs, ys, tbl
        except Exception as e:
            extra["smooth_error"] = str(e)[:160]
        _progress(extra)

    result = {
        "metric": f"maps/sec/chip nside={NSIDE} K={K} Chebyshev conv fwd "
                  f"(Fin={FIN} Fout={FOUT} batch={BATCH})",
        "value": round(maps_per_sec, 3),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / REFERENCE_MAPS_PER_SEC, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
