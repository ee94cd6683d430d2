"""Cost bisection of the Pallas strip builder at the headline config.

Stages: full / loads-only (no block compute) / blocks-only (no DMA
loads, compute on stale buffers) / neither (out-DMA + zeroing only).
Output is garbage in the skip modes; this only measures time.

Usage: python tools/bisect_strips.py [nside]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K, C = 5, 16


def bank(name, **kv):
    print("SBIS " + json.dumps({"stage": name, **kv}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from deepsphere_tpu.graph import build_sphere_graph
    from deepsphere_tpu.ops.pallas_strips import build_strips_pallas
    from deepsphere_tpu.ops.stencil import cface_embed

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    rng = np.random.RandomState(0)
    graph = build_sphere_graph(NSIDE, k=8, method="grid", cache_dir=cache)
    st = graph.face_stencil(0.75, n_steps=K - 1)
    x = jnp.asarray(rng.normal(size=(1, graph.n_pixels, C)), jnp.float32)
    xc = jax.block_until_ready(
        jax.jit(
            lambda x: cface_embed(x, st.nside, st.n_steps).reshape(
                C, 12, st.nside, -1
            )
        )(x)
    )

    def timed(skip, n_iters=30):
        @jax.jit
        def step(x):
            t, b, ls = build_strips_pallas(st, x, _debug_skip=skip)
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

    for name, skip in (
        ("full", ()),
        ("loads_only", ("blocks",)),
        ("blocks_only", ("loads",)),
        ("neither", ("loads", "blocks")),
    ):
        try:
            dt = timed(skip)
            bank(name, ms=round(dt * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            bank(name, error=str(e)[:300])


if __name__ == "__main__":
    main()
