"""On-chip A/B: deep-k (radius >= 3) conv via the LAP CHAIN vs the
per-step XLA stencil path.

Round-4 state: the one-shot fused kernel measured 30.92 ms at k=40
nside=128 K=5 vs 11.43 ms XLA per-step, so radius >= 3 was gated off the
fused path.  Round 5 adds ``ops.stencil.lap_chain_conv`` (one fused
launch per L~ application on the shallow n_steps == radius stencil);
this probe banks the decision numbers.  One subprocess per config — a
compile fault costs only that probe.

Usage:  python tools/probe_lapchain.py              # parent: all configs
        python tools/probe_lapchain.py --one K PATH # child: one config
Env:    PB_NSIDE (default 128), PB_K (csv ks, default "40,60"),
        PB_NT (poly order, default 5), PB_B, PB_F
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(os.environ.get("PB_NSIDE", 128))
KS = [int(s) for s in os.environ.get("PB_K", "40,60").split(",")]
NT = int(os.environ.get("PB_NT", 5))
B = int(os.environ.get("PB_B", 4))
F = int(os.environ.get("PB_F", 4))


def _numpy_cheby_conv(idx, val, x, kernel, K):
    B_, M, Fin = x.shape
    Fout = kernel.shape[-1]
    x2d = np.transpose(x, (1, 0, 2)).reshape(M, B_ * Fin).astype(np.float64)
    val = val.astype(np.float64)

    def spmv(y):
        acc = val[:, 0:1] * y[idx[:, 0]]
        for w in range(1, idx.shape[1]):
            acc = acc + val[:, w : w + 1] * y[idx[:, w]]
        return acc

    terms = [x2d]
    if K > 1:
        terms.append(spmv(x2d))
        for _ in range(2, K):
            terms.append(2.0 * spmv(terms[-1]) - terms[-2])
    tx = np.stack(terms, axis=0).reshape(K, M, B_, Fin)
    tx = np.transpose(tx, (2, 1, 3, 0)).reshape(B_ * M, Fin * K)
    return (tx @ kernel.astype(np.float64)).reshape(B_, M, Fout).astype(
        np.float32)


def child(k, path):
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops.stencil import (lap_chain_available,
                                            stencil_graph_conv,
                                            stencil_tables)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = build_sphere_graph(NSIDE, k=k, method="grid", cache_dir=cache)
    st = g.face_stencil(0.75)  # SHALLOW: n_steps == radius
    r = st.radius
    print(f"PROBE k={k} radius={r} n_steps={st.n_steps}", flush=True)

    if path == "xla":
        ds_config.set_use_pallas("off")
    else:
        assert lap_chain_available(st, "cheby", NT), "lap chain unavailable"

    rng = np.random.RandomState(0)
    kern_np = rng.normal(scale=0.1, size=(F * NT, F)).astype(np.float32)
    x_np = rng.normal(size=(B, g.n_pixels, F)).astype(np.float32)
    kern = jnp.asarray(kern_np)
    x = jnp.asarray(x_np)
    tables = jax.device_put(stencil_tables(st))

    @jax.jit
    def conv(tables, x, kern):
        return stencil_graph_conv(st, x, kern, NT, "cheby", tables=tables,
                                  layout="face")

    t0 = time.time()
    y = conv(tables, x, kern)
    np.asarray(y[0, 0, 0])
    print(f"PROBE k={k} path={path} compile+first_s={time.time()-t0:.1f}",
          flush=True)

    # correctness vs the pure-numpy f64 gather reference (face layout:
    # permute the reference's NEST result)
    from deepsphere_tpu.sphere.faces import face2nest_index

    idx_np, val_np = g.ellpack(0.75)
    f2n = face2nest_index(NSIDE)
    # f2n[i] = face position of NEST pixel i (bench.py stage_k20
    # convention): x_nest = x_face[f2n]; y_face[f2n] = y_nest
    x_nest = x_np[:, f2n, :]
    y_ref_nest = _numpy_cheby_conv(idx_np, val_np, x_nest, kern_np, NT)
    y_ref = np.empty_like(y_ref_nest)
    y_ref[:, f2n, :] = y_ref_nest
    err = float(np.max(np.abs(np.asarray(y) - y_ref)))
    print(f"PROBE k={k} path={path} max_abs_err={err:.3g}", flush=True)

    def readback(z):
        np.asarray(z[0, 0, 0])

    z = y
    for _ in range(3):
        z = conv(tables, z, kern)
    readback(z)
    t0 = time.time()
    n_it = 10
    for _ in range(n_it):
        z = conv(tables, z, kern)
    readback(z)
    dt = (time.time() - t0) / n_it
    print(f"PROBE k={k} path={path} step_ms={dt*1e3:.2f} "
          f"maps_per_s={B/dt:.1f}", flush=True)


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        child(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    for k in KS:
        for path in ("lap", "xla"):
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   str(k), path]
            print(f"== k={k} path={path} ==", flush=True)
            try:
                r = subprocess.run(cmd, timeout=2400, text=True,
                                   stdout=subprocess.PIPE,
                                   stderr=subprocess.STDOUT)
                for ln in r.stdout.splitlines():
                    if ln.startswith("PROBE"):
                        print(ln, flush=True)
                if r.returncode != 0:
                    tail = r.stdout.strip().splitlines()[-3:]
                    print(f"k={k} {path}: child rc={r.returncode}: "
                          + " | ".join(tail), flush=True)
            except subprocess.TimeoutExpired:
                print(f"k={k} {path}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
