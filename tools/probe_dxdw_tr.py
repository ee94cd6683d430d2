"""On-chip probe: can the fused dx+dW kernel run at Tr=128 (the forward's
band) instead of the Tr=64 the VMEM estimate forces?

The estimate says 162 MB at Tr=128/io_blocks=4 — over the 127 MB envelope —
but estimates have run both conservative (radius-1 forward: est 127 MB,
compiles fine) and optimistic (dot mode: est ok, actual 139 M OOM), so the
only way to know is to compile it.  A compile-time VMEM OOM faults the TPU
worker, hence ONE SUBPROCESS PER Tr — the parent stays clean and a fault
costs only that probe.

Usage:  python tools/probe_dxdw_tr.py            # parent: probes Tr=64,128
        python tools/probe_dxdw_tr.py --tr N     # child: one config
Env:    PB_NSIDE (default 1024), PB_K, PB_B, PB_FIN, PB_FOUT
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(os.environ.get("PB_NSIDE", 1024))
K = int(os.environ.get("PB_K", 5))
B = int(os.environ.get("PB_B", 4))
FIN = int(os.environ.get("PB_FIN", 4))
FOUT = int(os.environ.get("PB_FOUT", 4))


def child(tr):
    if tr:
        os.environ["DS_DXDW_TR"] = str(tr)
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.pallas_stencil import cfp_geometry
    from deepsphere_tpu.ops.stencil import stencil_tables

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    n, h = st.nside, st.n_steps
    rng = np.random.RandomState(0)
    tables = jax.device_put(stencil_tables(st))
    wext = tables["weights"].astype(jnp.float32)

    _, P_l = cfp_geometry(n, h)
    # dy in the conv's native layout (C = B*FOUT recursion channels)
    dy = jax.block_until_ready(jax.jit(lambda key: jax.random.normal(
        key, (B * FOUT, 12, n, P_l), jnp.float32))(jax.random.key(1)))
    # x (the forward input; corrupt-row zeroing skipped — timing probe)
    xr = jax.block_until_ready(jax.jit(lambda key: jax.random.normal(
        key, (B * FIN, 12, n, P_l), jnp.float32))(jax.random.key(2)))
    wk3t = jnp.asarray(
        rng.normal(scale=0.1, size=(K, FOUT, FIN)), jnp.float32)

    @jax.jit
    def strips_of(dy):
        return ps._strip_arrays(st, dy)

    strips = jax.block_until_ready(strips_of(dy))

    mask = jax.block_until_ready(jax.jit(
        lambda: ps._dw_mask_graph(st, jnp.float32))())

    @jax.jit
    def run(dy, wext, strips, wk3t, xr):
        return ps._run_dxdw_kernel(st, "cheby", K, dy, wext, strips, wk3t,
                                   xr, mask, B, False)

    t0 = time.time()
    dx, dwk = run(dy, wext, strips, wk3t, xr)
    np.asarray(dwk[0, 0])
    print(f"PROBE tr={tr} compile+first_s={time.time() - t0:.1f}", flush=True)
    # checksum for cross-Tr correctness comparison (interior only is what
    # matters, but full-sum of dwk is margin-independent)
    print(f"PROBE tr={tr} dwk_sum={float(jnp.sum(dwk)):.8e}", flush=True)

    for _ in range(3):
        dx, dwk = run(dx, wext, strips, wk3t, xr)
    np.asarray(dwk[0, 0])
    t0 = time.time()
    n_it = 10
    for _ in range(n_it):
        dx, dwk = run(dx, wext, strips, wk3t, xr)
    np.asarray(dwk[0, 0])
    dt = (time.time() - t0) / n_it
    print(f"PROBE tr={tr} dxdw_ms={dt * 1e3:.2f}", flush=True)


def main():
    if "--tr" in sys.argv:
        child(int(sys.argv[sys.argv.index("--tr") + 1]))
        return
    for tr in (0, 128):  # 0 = default geometry
        cmd = [sys.executable, os.path.abspath(__file__), "--tr", str(tr)]
        print(f"== probing tr={tr} ==", flush=True)
        try:
            r = subprocess.run(cmd, timeout=1500, text=True,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT)
            for ln in r.stdout.splitlines():
                if ln.startswith("PROBE"):
                    print(ln, flush=True)
            if r.returncode != 0:
                tail = r.stdout.strip().splitlines()[-3:]
                print(f"tr={tr}: child rc={r.returncode}: "
                      + " | ".join(tail), flush=True)
        except subprocess.TimeoutExpired:
            print(f"tr={tr}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
