"""On-chip cost bisection of the fused stencil kernel at the headline
config (nside=1024, K=5 cheby, Fin=Fout=4, B=4, f32).

Usage: python .round4/bisect_headline.py <mode>
  mode in {full, norecur, nocontract, norecur-nocontract}
One subprocess per mode (bisect string is baked into the trace).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
NSIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K, FIN, FOUT, BATCH = 5, 4, 4, 4


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import cface_embed, stencil_tables

    if MODE != "full":
        os.environ["DS_KB"] = MODE.replace("-", ",")
        ds_config.set_debug_kernel_bisect(True)

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(BATCH, graph.n_pixels, FIN)), jnp.float32)
    tables = jax.device_put(stencil_tables(st))
    xc = jax.block_until_ready(
        jax.jit(lambda x: cface_embed(x, st.nside, st.n_steps)
                .reshape(BATCH * FIN, 12, st.nside, -1))(x))
    wk3 = jnp.transpose(kernel.reshape(FIN, K, FOUT), (1, 0, 2))
    wext = tables["weights"].astype(jnp.float32)
    strips = jax.block_until_ready(jax.jit(
        lambda xc: ps._strip_arrays(st, xc))(xc))

    @jax.jit
    def kern_only(xc, wext, strips, wk3):
        return ps._run_stencil_kernel(st, "cheby", K, xc, wext, strips, wk3,
                                      BATCH, False)

    out = kern_only(xc, wext, strips, wk3)
    jax.block_until_ready(out)
    np.asarray(out[(0,) * out.ndim])
    n_iters = 20
    t0 = time.time()
    for _ in range(n_iters):
        out = kern_only(xc, wext, strips, wk3)
    np.asarray(out[(0,) * out.ndim])
    dt = (time.time() - t0) / n_iters
    print(f"BISECT mode={MODE} nside={NSIDE}: {dt*1e3:.2f} ms")


main()
