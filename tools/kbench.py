"""Microbenchmark for the fused Pallas stencil-conv kernel.

Isolates the pallas_call itself (native cfp activations + halo strips
prebuilt on device) from the full ``stencil_graph_conv`` wrapper (layout
transposes + strip builds + corner correction), at the headline shape
family: K=5 Chebyshev, Fin=Fout=4, batch 4.

Usage:  python tools/kbench.py [nside]
Env:    KB_ONLY=comma,list limits the measurements (full_conv, conv_cfp,
        strips, kernel_fwd, kernel_dw, fwd_dx_dw);
        KB_K, KB_FIN, KB_FOUT, KB_BATCH override the shape family;
        KB_DTYPE=bfloat16 measures the bf16 band mode (config.conv_dtype);
        KB_DTYPE=bfloat16_io measures the bf16 HBM-I/O mode (stage B:
        bf16 activations/strips/planes/output, halved DMA bytes);
        KB_CONTRACT=axpy|dot forces the channel-contraction strategy
        (default: config "auto" heuristic).
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
    """Chained timing with scalar host readback (see bench.py for why:
    block_until_ready can return before remote execution finishes on the
    tunneled TPU, and full-array readback poisons timings)."""
    import jax

    def readback(out):
        leaf = max(jax.tree_util.tree_leaves(out), key=lambda a: a.size)
        np.asarray(leaf[(0,) * leaf.ndim])  # device-side scalar read

    out = fn(*args)
    jax.block_until_ready(out)
    readback(out)
    t0 = time.time()
    for _ in range(n_iters):
        out = fn(*args) if chain is None else fn(*chain(args, out))
    readback(out)
    return (time.time() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu import config as ds_config
    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops import pallas_stencil as ps
    from deepsphere_tpu.ops.stencil import (
        cface_embed,
        stencil_graph_conv,
        stencil_tables,
    )

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    os.makedirs(cache, exist_ok=True)
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    npix = graph.n_pixels
    n = st.nside
    h = st.n_steps
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.normal(scale=0.1, size=(FIN * K, FOUT)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(BATCH, npix, FIN)), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    kb_dtype = os.environ.get("KB_DTYPE", "float32")
    ds_config.set_conv_dtype(kb_dtype)
    kb_contract = os.environ.get("KB_CONTRACT")
    if kb_contract:
        ds_config.set_contract_mode(kb_contract)
        print(f"contract mode : {kb_contract} (forced)")
    io_mode = kb_dtype == "bfloat16_io"
    if io_mode and not ps.cfp_io_available(st):
        print(f"bf16-I/O unsupported at nside={n} (needs nside % 16 == 0 "
              f"and nside >= roundup(h,16)); measuring stage-A band mode")
        kb_dtype = "bfloat16"
        ds_config.set_conv_dtype(kb_dtype)
        io_mode = False
    tables = jax.device_put(stencil_tables(st, bf16_io=io_mode))
    if kb_dtype != "float32":
        print(f"band mode     : {kb_dtype}")
    # effective per-kernel strategy (ADVICE r4 #4): a forced 'dot' may
    # silently upgrade to the stacked 'dots' or fall back to axpy, and the
    # dW kernel resolves its own plan — echo what will actually run
    eff_c, eff_bdt, eff_geom = ps.fwd_contract_plan(
        st, BATCH, FIN, FOUT, K,
        jnp.bfloat16 if io_mode else jnp.float32)
    print(f"fwd plan      : contract={eff_c} "
          f"band={'bf16' if eff_bdt == jnp.bfloat16 else 'f32'} "
          f"Tr={eff_geom[4]}")

    maps = lambda dt: BATCH / dt
    results = {}
    only = os.environ.get("KB_ONLY")
    only = set(only.split(",")) if only else None
    want = lambda name: only is None or name in only

    # full conv (face layout), as bench.py measures
    if want("full_conv"):
        @jax.jit
        def conv_full(tables, x, kernel):
            return stencil_graph_conv(st, x, kernel, K, "cheby",
                                      tables=tables, layout="face")

        dt = timed(conv_full, tables, x, kernel,
                   chain=lambda a, out: (a[0], out, a[2]))
        results["full_conv"] = dt
        print(f"full conv     : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # native-layout (cfp) conv with custom VJP, as a conv chain runs it
    @jax.jit
    def conv_cfp(tables, xc, kernel):
        return ps.fused_stencil_conv_cfp(st, tables, xc, kernel, K, "cheby",
                                         BATCH, interpret=interpret)

    xc = jax.block_until_ready(
        jax.jit(lambda x: cface_embed(x, n, h).reshape(BATCH * FIN, 12, n, -1))(x)
    )
    if io_mode:  # HBM activations in bf16, as a bf16-I/O conv chain runs
        xc = jax.block_until_ready(xc.astype(jnp.bfloat16))
    if want("conv_cfp"):
        dt = timed(conv_cfp, tables, xc, kernel,
                   chain=lambda a, out: (a[0], out, a[2]))
        results["conv_cfp"] = dt
        print(f"conv cfp      : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # kernel only: prebuilt strips + weight planes, bare pallas_call
    wk3 = jnp.transpose(kernel.reshape(FIN, K, FOUT), (1, 0, 2))
    wext = (tables["weights_bf16"] if io_mode
            else tables["weights"].astype(jnp.float32))

    @jax.jit
    def strips_only(xc):
        return ps._strip_arrays(st, xc)

    strips = jax.block_until_ready(strips_only(xc))
    if want("strips"):
        dt = timed(strips_only, xc)
        results["strips"] = dt
        print(f"strip build   : {dt*1e3:8.2f} ms")

    @jax.jit
    def kern_only(xc, wext, strips, wk3):
        return ps._run_stencil_kernel(st, "cheby", K, xc, wext, strips, wk3,
                                      BATCH, interpret)

    if want("kernel_fwd"):
        dt = timed(kern_only, xc, wext, strips, wk3)
        results["kernel_fwd"] = dt
        print(f"kernel fwd    : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    # dW kernel (same band windows, scalar contractions); dy must be a
    # true (BATCH*FOUT, ...) cotangent — slicing xc would silently clamp
    # to BATCH*FIN rows when FOUT > FIN and mismeasure the KB_FOUT shape.
    # Generated on device: a host float64 array of this shape is ~1.8 GB
    # at nside=1024.
    dy = jax.block_until_ready(jax.random.normal(
        jax.random.key(1), (BATCH * FOUT,) + xc.shape[1:], xc.dtype
    ))

    @jax.jit
    def grad_only(xc, wext, strips, dy):
        return ps._run_grad_kernel(st, "cheby", K, xc, wext, strips, dy,
                                   BATCH, FIN, interpret)

    if want("kernel_dw"):
        dt = timed(grad_only, xc, wext, strips, dy)
        results["kernel_dw"] = dt
        print(f"kernel dW     : {dt*1e3:8.2f} ms")

    # full train-ish step: value+grad through the cfp conv
    @jax.jit
    def vjp_step(tables, xc, kernel):
        def loss(xc, kernel):
            y = ps.fused_stencil_conv_cfp(st, tables, xc, kernel, K, "cheby",
                                          BATCH, interpret=interpret)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, (dx, dk) = jax.value_and_grad(loss, argnums=(0, 1))(xc, kernel)
        return l, dx, dk

    if want("fwd_dx_dw"):
        dt = timed(vjp_step, tables, xc, kernel,
                   chain=lambda a, out: (a[0], out[1], a[2]))
        results["fwd_dx_dw"] = dt
        print(f"fwd+dx+dW     : {dt*1e3:8.2f} ms   {maps(dt):8.1f} maps/s")

    return results


if __name__ == "__main__":
    main()
