"""On-chip A/B check of the fused dx+dW backward (config.fused_dw) vs the
two-kernel reference path, at a small nside so the Mosaic compile is cheap.

Usage: python tools/check_dxdw_tpu.py [nside] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepsphere_tpu import config
from deepsphere_tpu.graph import build_sphere_graph
from deepsphere_tpu.ops.stencil import stencil_graph_conv, stencil_tables


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    B, Fin, Fout = 2, 2, 3
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    graph = build_sphere_graph(nside, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    tables = jax.device_put(stencil_tables(st))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(B, graph.n_pixels, Fin)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(Fin * K, Fout)), jnp.float32)

    def loss(tables, x, k):
        y = stencil_graph_conv(st, x, k, K, "cheby", tables=tables,
                               layout="face")
        return jnp.sum(y * y)

    grad = jax.jit(jax.grad(loss, argnums=(1, 2)))

    print(f"[{time.strftime('%H:%M:%S')}] compiling fused_dw=True "
          f"(nside={nside} K={K})...", flush=True)
    assert config.fused_dw
    gx1, gk1 = grad(tables, x, kern)
    gk1_host = np.asarray(gk1)
    gx1_s = np.asarray(jnp.sum(jnp.abs(gx1)))
    print(f"[{time.strftime('%H:%M:%S')}] fused done; compiling "
          "fused_dw=False...", flush=True)

    config.set_fused_dw(False)
    grad2 = jax.jit(jax.grad(loss, argnums=(1, 2)))
    gx2, gk2 = grad2(tables, x, kern)
    gk2_host = np.asarray(gk2)
    gx2_s = np.asarray(jnp.sum(jnp.abs(gx2)))

    dgx = np.asarray(jnp.max(jnp.abs(gx1 - gx2)) /
                     (jnp.max(jnp.abs(gx2)) + 1e-30))
    dgk = np.abs(gk1_host - gk2_host).max() / (np.abs(gk2_host).max() + 1e-30)
    print(f"dx rel-max diff: {dgx:.3e}  (|dx| sums {gx1_s:.6g} vs {gx2_s:.6g})")
    print(f"dW rel-max diff: {dgk:.3e}")
    ok = dgx < 1e-5 and dgk < 1e-5
    print("OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
