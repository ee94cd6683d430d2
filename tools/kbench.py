"""Microbenchmark for the fused Pallas stencil-conv kernel.

Isolates the pallas_call itself (xpad/wpad prebuilt on device) from the
full ``stencil_graph_conv`` wrapper (pad_faces + layout transposes +
corner correction), at the headline shape family: K=5 Chebyshev,
Fin=Fout=4, batch 4.

Usage:  python tools/kbench.py [nside] [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(os.environ.get("KB_K", 5))
FIN = int(os.environ.get("KB_FIN", 4))
FOUT = int(os.environ.get("KB_FOUT", 4))
BATCH = int(os.environ.get("KB_BATCH", 4))


def timed(fn, *args, n_iters=20, chain=None):
    """Chained timing with host readback (see bench.py for why)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])
    t0 = time.time()
    for _ in range(n_iters):
        out = fn(*args) if chain is None else fn(*chain(args, out))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])
    return (time.time() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    os.makedirs(cache, exist_ok=True)
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    npix = graph.n_pixels
    n = st.nside
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(BATCH, npix, FIN)), jnp.float32)
    tables = jax.device_put(stencil_tables(st))

    C = BATCH * FIN
    Cout = BATCH * FOUT

    # prebuilt kernel inputs (channels-first padded activations)
    from deepsphere_tpu.ops.stencil import pad_faces

    @jax.jit
    def prep(tables, x):
        x3 = jnp.transpose(x, (0, 2, 1)).reshape(BATCH * FIN, 12, n, n)
        xpad = ps._assemble_padded(st, tables, x3)
        wk3 = jnp.transpose(kernel.astype(jnp.float32).reshape(FIN, K, FOUT), (1, 0, 2))
        return xpad, wk3

    xpad, wk3 = jax.block_until_ready(prep(tables, x))
    wpad = tables["weights"]

    maps = lambda dt: BATCH / dt

    results = {}

    # full conv (face layout), as bench.py measures
    @jax.jit
    def conv_full(tables, x, kernel):
        return stencil_graph_conv(st, x, kernel, K, "cheby", tables=tables,
                                  layout="face")

    dt = timed(conv_full, tables, x, kernel,
               chain=lambda a, out: (a[0], out, a[2]))
    results["full_conv"] = dt
    print(f"full conv     : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # kernel only
    @jax.jit
    def kern_only(tables, xpad, wk3):
        return ps._run_stencil_kernel(st, "cheby", K, xpad, tables["weights"],
                                      wk3, BATCH, False)

    dt = timed(kern_only, tables, xpad, wk3)
    results["kernel_fwd"] = dt
    print(f"kernel fwd    : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # wrapper overhead probe: pad_faces + transposes alone
    dt = timed(prep, tables, x)
    results["prep"] = dt
    print(f"prep (pad+T)  : {dt*1e3:8.2f} ms")


    # channels-first conv (the model-chain hot path: zero transposes)
    @jax.jit
    def conv_cf(tables, x3, kernel):
        return ps.fused_stencil_conv_cf(st, tables, x3, kernel, K, "cheby", BATCH)

    x3 = jax.block_until_ready(jax.jit(
        lambda x: jnp.transpose(x, (0, 2, 1)).reshape(BATCH * FIN, 12, n, n))(x))
    dt = timed(conv_cf, tables, x3, kernel,
               chain=lambda a, out: (a[0], out, a[2]))
    results["conv_cf"] = dt
    print(f"conv cf       : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # halo assembly alone
    @jax.jit
    def asm(tables, x3):
        return ps._assemble_padded(st, tables, x3)
    dt = timed(asm, tables, x3)
    results["assemble"] = dt
    print(f"assemble      : {dt*1e3:8.2f} ms")

    return results


if __name__ == "__main__":
    main()
