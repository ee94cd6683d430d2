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


def main():
    import jax
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

    dt = _time(conv_cface, st_tables, x5, kernel)
    maps_per_sec = BATCH / dt

    extra = {
        "step_ms": round(dt * 1e3, 2),
        "graph_build_s": round(build_s, 1),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }

    @jax.jit
    def conv_stencil(tables, x, kernel):
        return stencil_graph_conv(
            st, x, kernel, K, "cheby", tables=tables, layout="face"
        )

    dt_f = _time(conv_stencil, st_tables, x, kernel, n_iters=5)
    extra["face_flat_step_ms"] = round(dt_f * 1e3, 2)

    if os.environ.get("BENCH_GATHER_PATH", "1") == "1":
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
