"""On-chip bisection probe for the k>=20 deep-halo (radius>=2) fused conv path
that kernel-faulted the TPU worker in the round-2 bench (VERDICT.md #2).

Each invocation runs ONE config in THIS process (use a fresh process per
probe — a chip fault poisons the runtime).  Prints PROBE-RESULT {json} on
success; a fault kills the process, which the caller observes.

Usage:
    python tools/probe_k20.py NSIDE STRIPS [CONTRACT]
      NSIDE    e.g. 64 / 256
      STRIPS   xla | auto   (auto = Pallas strip builder on TPU)
      CONTRACT auto | axpy | dot (default auto)

Sequence used for the bisection (one subprocess each):
    64 xla   -> fault here = conv kernel bug independent of strips/size
    64 auto  -> fault here only = strip-builder bug
    256 xla  -> fault here only = size-dependent conv bug
    256 auto -> the exact round-2 bench config
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    strips = sys.argv[2] if len(sys.argv) > 2 else "xla"
    contract = sys.argv[3] if len(sys.argv) > 3 else "auto"
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    K = int(os.environ.get("PROBE_K", 5))
    FIN, FOUT, BATCH = 4, 4, 4

    import jax
    import jax.numpy as jnp

    import deepsphere_tpu.config as cfg
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops.spmv import chebyshev_basis, graph_conv
    from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables
    from deepsphere_tpu.sphere.faces import face2nest_index

    cfg.set_strips_mode(strips)
    if contract != "auto":
        cfg.set_contract_mode(contract)
    if os.environ.get("PROBE_PALLAS"):
        # "off" = XLA per-step stencil path at the same shape (A/B timing)
        cfg.set_use_pallas(os.environ["PROBE_PALLAS"])
    if os.environ.get("DS_KB"):
        # kernel-piece bisection (norecur / nocontract / nolanestore):
        # correctness vs the reference is then expected to FAIL — the
        # signal is whether the chip survives the run at all
        cfg.set_debug_kernel_bisect(True)

    cache = __file__.rsplit("/", 2)[0] + "/.bench_cache"
    out = {"nside": nside, "k": k, "strips": strips, "contract": contract,
           "platform": jax.devices()[0].platform,
           "pallas": cfg.use_pallas, "K": K}
    t0 = time.time()
    g = build_sphere_graph(nside, k=k, method="grid", cache_dir=cache)
    st = g.deep_stencil(0.75, K)
    out["build_s"] = round(time.time() - t0, 1)
    out["radius"] = int(st.radius)
    out["h"] = int(st.n_steps)

    tables = jax.device_put(stencil_tables(st))
    kernel = jnp.asarray(
        np.random.RandomState(0).normal(scale=0.1, size=(FIN * K, FOUT)),
        jnp.float32,
    )
    x_nest = np.random.RandomState(3).normal(
        size=(BATCH, g.n_pixels, FIN)).astype(np.float32)

    # reference on the gather path (NEST), permuted to face layout on host
    idx_np, val_np = g.ellpack(0.75)
    ell = jax.device_put({"idx": idx_np, "val": val_np})
    y_ref_nest = np.asarray(jax.jit(lambda e, x, k: graph_conv(
        lambda x2d, nt: chebyshev_basis(e["idx"], e["val"], x2d, nt),
        x, k, K))(ell, jnp.asarray(x_nest), kernel))
    del ell
    f2n = face2nest_index(nside)
    x_face = np.empty_like(x_nest)
    x_face[:, f2n, :] = x_nest
    y_ref = np.empty_like(y_ref_nest)
    y_ref[:, f2n, :] = y_ref_nest
    xf = jnp.asarray(x_face)
    print(f"[probe] gather reference done ({time.time()-t0:.0f}s); "
          f"compiling fused path...", file=sys.stderr, flush=True)

    @jax.jit
    def conv(tables, x, kernel):
        return stencil_graph_conv(st, x, kernel, K, "cheby", tables=tables,
                                  layout="face")

    t1 = time.time()
    y = np.asarray(conv(tables, xf, kernel))
    out["compile_and_first_run_s"] = round(time.time() - t1, 1)
    out["max_abs_err"] = float(np.max(np.abs(y - y_ref)))

    # timing (chained; Fin == Fout)
    z = conv(tables, xf, kernel)
    np.asarray(z[0, 0, 0])
    t2 = time.time()
    n_it = 10
    for _ in range(n_it):
        z = conv(tables, z, kernel)
    np.asarray(z[0, 0, 0])
    out["step_ms"] = round((time.time() - t2) / n_it * 1e3, 2)
    print("PROBE-RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
